"""Count-min sketch: structural overestimate, exactness when collision-
free, determinism, and the measured bound headroom at both driver SFs
(the catalog entry's asserted 3x margin must actually hold)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from conftest import SF_ORACLE, TESTDATA
from rust_evm_indexer_spark.operators.sketch import cms_estimates


def test_estimate_never_underestimates_and_is_exact_when_sparse(spark):
    # 10 keys in a 4096-wide sketch: collisions are (near-)impossible,
    # so estimates must EQUAL exact counts; with width=2 they may only
    # overestimate
    df = spark.createDataFrame(
        [(f"k{i % 10}",) for i in range(1000)], "k string"
    )
    wide = cms_estimates(df, "k").collect()
    assert all(r["n_est"] == r["n_exact"] == 100 for r in wide)
    narrow = cms_estimates(df, "k", width=2, depth=2).collect()
    assert all(r["n_est"] >= r["n_exact"] for r in narrow)
    assert any(r["n_est"] > r["n_exact"] for r in narrow)  # forced collisions


def test_deterministic_across_repartitionings(spark):
    df = spark.createDataFrame([(f"k{i % 50}",) for i in range(2000)], "k string")
    a = sorted(map(tuple, cms_estimates(df, "k").collect()))
    b = sorted(map(tuple, cms_estimates(df.repartition(17), "k").collect()))
    assert a == b


def test_bound_margin_holds_at_both_driver_sfs(spark):
    """The catalog entry asserts n_est <= n_exact + 3*ceil(eN/w); this
    pins the measured headroom (excess 0 at sf0.01, 73 vs bound 199 at
    sf0.1) so a datagen or hashing change that erodes it fails HERE,
    not in the driver's hash row."""
    for sf_dir in (SF_ORACLE, TESTDATA / "sf0.1"):
        ev = spark.read.parquet(str(sf_dir / "events.parquet"))
        n = ev.count()
        bound = 3 * math.ceil(math.e / 4096 * n)
        worst = (
            cms_estimates(ev, "user_id")
            .agg(F.max(F.col("n_est") - F.col("n_exact")).alias("m"))
            .first()["m"]
        )
        assert 0 <= worst <= bound // 2, (sf_dir, worst, bound)

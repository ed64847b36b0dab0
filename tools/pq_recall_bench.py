#!/usr/bin/env python3
"""Layered IVFPQ recall across encoding regimes × corpus geometry
(VERDICT r7 items 3 + 5).

Measures recall@10 (overlap with exact brute-force cosine top-10,
averaged over NQ held-in queries, self excluded) through the SAME
IVF probe for four encodings:

    flat        global-codebook ADC          (by_residual=False)
    residual    FAISS-default residual ADC   (by_residual=True)
    opq_flat    OPQ rotation + global ADC
    opq_resid   OPQ rotation over residuals

on two corpora:

    isotropic   the driver's sf0.01 embeddings (~uniform on the
                sphere, residual norm ratio ≈0.965 — r7 measured that
                residual CANNOT help here; the bound is geometry)
    clustered   datagen.write_clustered_embeddings — mixture of
                Gaussians, the regime real text embeddings live in

Also reports the probe-layer ceiling (recall of the exact top-10 that
survives the n_probe cells — no encoding can beat it) and the residual
norm ratio per corpus.  Prints one JSON line; SCALE.md records it.

Run: ``python tools/pq_recall_bench.py`` (~3-5 min).
"""
from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

M, K, ITERS = 8, 16, 8
N_CELLS, N_PROBE = 8, 2
NQ, TOPK = 16, 10
ISO = "/root/testdata/sf0.01"


def main() -> int:
    import numpy as np

    from pyspark.sql import functions as F

    from rust_evm_indexer_spark.operators import pq as PQ
    from rust_evm_indexer_spark.operators import similarity as sim
    from rust_evm_indexer_spark.session import get_spark
    from rust_evm_indexer_spark import datagen

    spark = get_spark("pq-recall-bench")
    work = Path(tempfile.mkdtemp(prefix="pq_recall_"))
    clustered_dir = datagen.write_clustered_embeddings(
        work / "clustered", n=2000, dim=64, n_clusters=8, spread=0.06,
        seed=11,
    )
    corpora = {
        "isotropic": str(Path(ISO) / "embeddings.parquet"),
        "clustered": str(clustered_dir / "embeddings.parquet"),
    }
    t0 = time.perf_counter()
    out: dict = {"bench": "pq_recall", "m": M, "k": K,
                 "n_cells": N_CELLS, "n_probe": N_PROBE, "topk": TOPK,
                 "nq": NQ, "corpora": {}}

    for cname, path in corpora.items():
        emb = spark.read.parquet(path)
        idx = sim.IvfIndex.build(emb, work / f"ivf_{cname}", k=N_CELLS,
                                 iters=5)
        # residual energy: mean |x - centroid(cell)| / |x|
        cents = {int(c): np.asarray(v) for c, v in idx.centroids.items()}
        sample = idx.vectors().orderBy("vec_id").limit(512).collect()
        ratios = []
        for r in sample:
            x = np.asarray(r["embedding"], dtype=np.float64)
            c = cents[int(r["cell"])]
            ratios.append(float(np.linalg.norm(x - c) / np.linalg.norm(x)))
        R = PQ.opq_train_rotation(emb, m=M)
        regimes = {
            "flat": dict(rot=None, res=False),
            "residual": dict(rot=None, res=True),
            "opq_flat": dict(rot=R, res=False),
            "opq_resid": dict(rot=R, res=True),
        }
        dirs = {}
        books = {}
        for rname, cfg in regimes.items():
            if cfg["res"]:
                cb = PQ.ivfpq_train_residual(idx, m=M, k=K, iters=ITERS,
                                             rotation=cfg["rot"])
            else:
                cb = PQ.pq_train(emb, m=M, k=K, iters=ITERS,
                                 rotation=cfg["rot"])
            d = work / f"codes_{cname}_{rname}"
            PQ.ivfpq_write_codes(idx, cb, d, by_residual=cfg["res"],
                                 rotation=cfg["rot"])
            dirs[rname], books[rname] = d, cb

        qrows = emb.orderBy("vec_id").limit(NQ).collect()
        hits = {r: 0 for r in regimes}
        probe_ceiling = 0
        cell_of = {r["vec_id"]: int(r["cell"])
                   for r in idx.vectors().select("vec_id", "cell").collect()}
        for qr in qrows:
            qid, qv = qr["vec_id"], [float(x) for x in qr["embedding"]]
            exact = {r["vec_id"] for r in sim.brute_force_topk(
                emb, qv, k=TOPK, exclude_ids=(qid,)).collect()}
            probe = set(idx.probe_cells(qv, N_PROBE))
            probe_ceiling += sum(1 for v in exact if cell_of[v] in probe)
            for rname, cfg in regimes.items():
                got = {r["vec_id"] for r in PQ.ivfpq_search(
                    spark, idx, dirs[rname], books[rname], qv, topk=TOPK,
                    n_probe=N_PROBE, exclude_ids=(qid,),
                    by_residual=cfg["res"], rotation=cfg["rot"],
                ).collect()}
                hits[rname] += len(exact & got)
        out["corpora"][cname] = {
            "residual_norm_ratio": round(sum(ratios) / len(ratios), 3),
            "probe_ceiling": round(probe_ceiling / NQ, 2),
            "recall_at_10": {
                rname: round(h / NQ, 2) for rname, h in hits.items()
            },
        }
        print(f"{cname}: ratio="
              f"{out['corpora'][cname]['residual_norm_ratio']} "
              f"ceiling={out['corpora'][cname]['probe_ceiling']} "
              f"{out['corpora'][cname]['recall_at_10']}", file=sys.stderr)

    out["wall_sec"] = round(time.perf_counter() - t0, 1)
    spark.stop()
    print(json.dumps(out, separators=(",", ":")), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

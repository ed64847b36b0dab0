"""applyInPandasWithState: running totals must accumulate across
micro-batches and converge to the batch groupBy answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from rust_evm_indexer_spark.sources.batch import load_driver_table
from rust_evm_indexer_spark.streaming.stateful import running_user_totals

from conftest import SF_SMOKE


def test_running_totals_across_microbatches(spark, tmp_path):
    # split events into 3 files → maxFilesPerTrigger=1 forces 3 batches
    events = load_driver_table(spark, SF_SMOKE, "events").where(
        F.col("user_id") < 20
    )
    stream_dir = tmp_path / "stream_src"
    events.repartition(3).write.parquet(str(stream_dir))

    schema = spark.read.parquet(str(stream_dir)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir))
    )
    q = (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("totals")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert q.lastProgress["batchId"] >= 2  # really ran multiple batches
    finally:
        q.stop()

    # last update per user == full batch aggregation
    out = spark.sql(
        "SELECT user_id, n_events, total_cents FROM totals"
    ).toPandas()
    last = out.groupby("user_id").last()  # memory sink appends updates in order
    final = {
        int(u): (int(r["n_events"]), int(r["total_cents"]))
        for u, r in last.iterrows()
    }
    want = {
        r["user_id"]: (r["n"], r["cents"])
        for r in events.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .collect()
    }
    assert final == want

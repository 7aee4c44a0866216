"""applyInPandasWithState custom operator: milestone counts accumulate
across micro-batches and match the batch-mode equivalent."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql.window import Window

from trough_spark.streaming import events as E
from trough_spark.streaming.stateful import user_milestones
from trough_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_user_milestones_stream_matches_batch(spark, tmp_path):
    path = str(tmp_path / "in")
    df = load_table(spark, SF, "events")
    # multiple files → multiple micro-batches → state must carry across
    df.repartition(4).write.mode("overwrite").parquet(path)

    stream = (
        spark.readStream.schema(E.EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    q = (
        user_milestones(stream, step=10)
        .writeStream.format("memory")
        .queryName("milestones_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["milestone"]): r["total_events"]
        for r in spark.sql("SELECT * FROM milestones_out").collect()
    }

    # batch equivalent: per-user cumulative count crossing multiples of 10
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    batch = (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") % 10 == 0)
        .select("user_id", (F.col("rn") / 10).cast("bigint").alias("milestone"),
                F.col("rn").cast("bigint").alias("total_events"))
    )
    expected = {
        (r["user_id"], r["milestone"]): r["total_events"] for r in batch.collect()
    }
    # milestone COUNTS must agree; ordering within a micro-batch is by
    # arrival, so compare the set of (user, milestone)->count trios
    assert got == expected
    assert got, "no milestones emitted"

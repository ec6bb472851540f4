"""Structured-Streaming tail analog (T1–T8).

The reference tails the oplog with a blocking tailable-await cursor per
shard (TailCommand.java:534-547), accumulating per-(ns,op) stats in memory
and reporting every 30 s (TailCommand.java:750-763).  Spark mapping:

  T1 unbounded source   → file-source readStream on the transcript
                          directory (new files = new oplog entries); on a
                          real deployment the same code binds to a Kafka /
                          Iceberg-streaming source — only ``readStream``
                          changes.
  T2 start offset       → checkpointed source offsets (startingTimestamp
                          analog); Spark tracks them per file/partition.
  T3 heartbeat          → StreamingQueryProgress + the metrics sink written
                          by foreachBatch.
  T5 graceful drain     → query.stop() + idempotent final aggregate from
                          the cumulative state table.
  T6 stateful op        → cumulative aggregates maintained exactly by
                          re-aggregating the per-batch partials (counts/
                          sums/mins/maxes merge associatively — the same
                          algebra as EntryAccumulator.merge(),
                          EntryAccumulator.java:210-228).
  T8 resume             → the stream checkpoint directory; the reference
                          has no cross-restart resume (TailCommand.java:540)
                          — this is the north_rule extension.  foreachBatch
                          is at-least-once, so the partial/metrics sinks are
                          per-batch_id overwrites (replay-idempotent — see
                          _sink_batch).

``Trigger.AvailableNow`` drains everything present and stops — giving the
bounded-prefix semantics the reference produces at each report, and making
the operation testable and idempotent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.filters import exclude_system_namespaces
from ..operators.parse import parse_transcripts

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


class TailStream:
    """Incrementally tail a growing transcript directory, maintaining the
    cumulative ns::op accumulator report across micro-batches."""

    def __init__(
        self,
        spark: SparkSession,
        input_dir: str,
        work_dir: str,
        buckets: tuple[int, ...] = (),
    ) -> None:
        """``buckets`` adds A3 threshold counters (rows with size strictly
        > t, EntryAccumulator.java:65-70) to the accumulator — per-batch
        partial sums, merged like every other counter.  The bucket set is
        part of the partials schema: pick it when the work_dir is created
        and keep it across resumes (the num_batches-adoption posture —
        changing it mid-stream needs a fresh work_dir)."""
        self.spark = spark
        self.input_dir = input_dir
        self.buckets = tuple(int(b) for b in buckets)
        self.checkpoint_dir = os.path.join(work_dir, "checkpoint")
        self.partials_dir = os.path.join(work_dir, "partials")
        self.metrics_dir = os.path.join(work_dir, "metrics")
        self.stateful_dir = os.path.join(work_dir, "stateful")
        self.stateful_checkpoint_dir = os.path.join(work_dir, "stateful_ckpt")

    def _source(self) -> DataFrame:
        return (
            self.spark.readStream.schema(TRANSCRIPT_SCHEMA)
            .option("maxFilesPerTrigger", 8)
            .parquet(self.input_dir)
        )

    def _batch_aggregate(self, batch: DataFrame) -> DataFrame:
        """Per-batch partial of the A1 accumulator — merge-safe columns
        only (count/total/min/max; avg derived at read time).  Grouped over
        ALL namespaces; the system-ns exclusion is applied to the GROUPS
        (ns is a group key, so filtering after the aggregate is identical)
        by the caller — letting the heartbeat metrics derive from the same
        single scan."""
        parsed = parse_transcripts(batch, with_diff_stats=False)
        aggs = [
            F.count(F.lit(1)).alias("count"),
            F.sum("size").alias("total_size"),
            F.min("size").alias("min_size"),
            F.max("size").alias("max_size"),
            F.max("ts").alias("latest_ts"),
        ]
        for b in self.buckets:
            aggs.append(
                F.sum(F.when(F.col("size") > b, 1).otherwise(0)).alias(f"gt_{b}")
            )
        return parsed.groupBy("ns", "op").agg(*aggs)

    def _sink_batch(self, batch: DataFrame, batch_id: int) -> None:
        """Idempotent micro-batch sink.  foreachBatch is at-least-once: a
        crash after the write but before the stream's offset commit REPLAYS
        the batch with the SAME batch_id on resume.  Writing each batch to
        its own ``batch_id=<k>/`` partition with overwrite makes the replay
        a no-op rewrite instead of an append that report() would
        double-count.

        Single scan per micro-batch (VERDICT r02 #4): the (ns,op) partial
        aggregate is computed once and PERSISTED (it is group-count-sized);
        the partials write filters its groups, and the T3 heartbeat is
        derived from the same cached rows (rows = Σcount, latest_ts =
        max(latest_ts)) instead of a second pass over the batch."""
        agg = self._batch_aggregate(batch).persist()
        try:
            exclude_system_namespaces(agg).write.mode("overwrite").parquet(
                os.path.join(self.partials_dir, f"batch_id={batch_id}")
            )
            # T3 heartbeat record: rows + lag proxy per batch (all ns,
            # matching the raw batch row count)
            agg.agg(
                F.coalesce(F.sum("count"), F.lit(0)).alias("rows"),
                F.max("latest_ts").alias("latest_ts"),
            ).write.mode("overwrite").parquet(
                os.path.join(self.metrics_dir, f"batch_id={batch_id}")
            )
        finally:
            agg.unpersist()

    def run_available(self) -> None:
        """Drain all currently-available input (Trigger.AvailableNow), then
        stop — one resumable increment of the unbounded tail."""
        q = (
            self._source()
            .writeStream.foreachBatch(self._sink_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # -- T6 as TRUE operator state (applyInPandasWithState) ----------------
    def run_stateful_available(self) -> None:
        """Alternative T6 path: the per-(ns,op) accumulator maintained as
        explicit stream state (the reference's in-memory accumulator map,
        EntryAccumulator.java:41-71, as a Spark stateful operator).  State
        lives in the stream checkpoint, so a later drain RESUMES the
        accumulator exactly (T8) — no partial-merging at read time.  Each
        micro-batch emits the UPDATED groups; the sink keeps the newest row
        per group (idempotent per-batch_id overwrite, as _sink_batch)."""
        import pandas as pd  # noqa: F401  (worker-side import)
        from pyspark.sql.streaming.state import GroupStateTimeout

        out_schema = (
            "ns string, op string, count long, total_size long, "
            "min_size long, max_size long"
        )
        state_schema = "count long, total_size long, min_size long, max_size long"

        def update(key, pdfs, state):
            import pandas as pd

            count = total = 0
            mn = mx = None
            if state.exists:
                count, total, mn, mx = state.get
            for pdf in pdfs:
                s = pdf["size"]
                count += int(len(s))
                total += int(s.sum())
                bmn, bmx = int(s.min()), int(s.max())
                mn = bmn if mn is None else min(mn, bmn)
                mx = bmx if mx is None else max(mx, bmx)
            state.update((count, total, mn, mx))
            yield pd.DataFrame(
                {
                    "ns": [key[0]], "op": [key[1]], "count": [count],
                    "total_size": [total], "min_size": [mn], "max_size": [mx],
                }
            )

        parsed = exclude_system_namespaces(
            parse_transcripts(self._source(), with_diff_stats=False)
        )
        updates = parsed.groupBy("ns", "op").applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )

        def sink(batch: DataFrame, batch_id: int) -> None:
            batch.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "overwrite"
            ).parquet(os.path.join(self.stateful_dir, f"bid={batch_id}"))

        q = (
            updates.writeStream.foreachBatch(sink)
            .option("checkpointLocation", self.stateful_checkpoint_dir)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def stateful_report(self) -> DataFrame:
        """Newest emitted row per (ns,op) across batches = the accumulator's
        current state, with floor-avg display parity."""
        from pyspark.sql import Window

        rows = self.spark.read.option("basePath", self.stateful_dir).parquet(
            os.path.join(self.stateful_dir, "bid=*")
        )
        w = Window.partitionBy("ns", "op").orderBy(F.desc("batch_id"))
        latest = (
            rows.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") == 1)
            .drop("__r", "batch_id")
        )
        return latest.withColumn(
            "avg_size", F.floor(F.col("total_size") / F.col("count")).cast("long")
        )

    def report(self) -> DataFrame:
        """Cumulative A1 report: final merge of all batch partials — the
        same partial/final algebra as the reference's mergeShardResults
        (TailCommand.java:1103-1146), with floor-avg display parity."""
        partials = self.spark.read.option("basePath", self.partials_dir).parquet(
            os.path.join(self.partials_dir, "batch_id=*")
        )
        aggs = [
            F.sum("count").alias("count"),
            F.sum("total_size").alias("total_size"),
            F.min("min_size").alias("min_size"),
            F.max("max_size").alias("max_size"),
            F.max("latest_ts").alias("latest_ts"),
        ]
        for b in self.buckets:
            aggs.append(F.sum(f"gt_{b}").alias(f"gt_{b}"))
        merged = partials.groupBy("ns", "op").agg(*aggs)
        return merged.withColumn(
            "avg_size", F.floor(F.col("total_size") / F.col("count")).cast("long")
        ).orderBy(F.desc("total_size"), "ns", "op")

    def lag_seconds(self, now_ts: str) -> DataFrame:
        """T4/P8 — lag vs a supplied wallclock (TailCommand.java:1073-1082;
        max(0, wallclock − latest event ts))."""
        m = self.spark.read.parquet(self.metrics_dir)
        return m.agg(
            F.greatest(
                F.lit(0).cast("long"),
                (
                    F.unix_timestamp(F.lit(now_ts).cast("timestamp"))
                    - F.unix_timestamp(F.max("latest_ts"))
                ).cast("long"),
            ).alias("lag_sec")
        )

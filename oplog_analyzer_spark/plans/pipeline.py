"""The checkpointed, resumable parse → enrich → route → aggregate pipeline.

This is the north_rule deliverable: the reference's tail loop
(TailCommand.java:552-773 — filter, parse, accumulate, dump) rebuilt as an
incremental batch pipeline over a transcript table, with what the reference
lacks entirely (T8 — no resume across restarts, TailCommand.java:540):

  * the input is split into deterministic batches by a ts-derived bucket
    (the Spark analog of consuming the oplog in ts order);
  * each batch runs parse → enrich → route and lands in its own
    ``batch=<k>/category=<c>/`` parquet partition (idempotent overwrite —
    a batch killed mid-write is simply rewritten on resume);
  * a checkpoint JSON records completed batches with per-batch lineage
    (rows in/out) and metrics; resume skips completed batches;
  * final per-sink aggregates are computed FROM the routed sinks (the
    system of record), so they are exact and identical no matter how many
    kill/resume cycles happened — the reference's merge-at-shutdown
    (TailCommand.java:1103-1146) without the shutdown races it guards
    against (TailCommand.java:817-921).

Scale notes: batches map to Iceberg snapshot ranges on a real cluster; the
per-batch write is a full shuffle-free pass (parse/enrich/route are narrow
after the broadcast join), and the only shuffles in the whole pipeline are
the final aggregate's.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.filters import exclude_system_namespaces
from ..operators.parse import parse_transcripts, unwind_applyops
from ..sources.sinks import per_sink_aggregates, route_categories, write_routed


class TranscriptPipeline:
    def __init__(
        self,
        spark: SparkSession,
        work_dir: str,
        tool_catalog: DataFrame,
        num_batches: int = 4,
        with_diff_stats: bool = True,
    ) -> None:
        self.spark = spark
        self.work_dir = work_dir
        self.tool_catalog = tool_catalog
        self.num_batches = num_batches
        self.with_diff_stats = with_diff_stats
        self.routed_dir = os.path.join(work_dir, "routed")
        self.metrics_dir = os.path.join(work_dir, "metrics")
        self.checkpoint_path = os.path.join(work_dir, "checkpoint.json")

    # -- checkpoint bookkeeping ------------------------------------------
    def _load_checkpoint(self) -> dict:
        if os.path.exists(self.checkpoint_path):
            with open(self.checkpoint_path) as f:
                return json.load(f)
        return {"completed": {}, "num_batches": self.num_batches}

    def _save_checkpoint(self, state: dict) -> None:
        tmp = self.checkpoint_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f, indent=1, sort_keys=True)
        os.replace(tmp, self.checkpoint_path)  # atomic commit point

    # -- stages ----------------------------------------------------------
    def _assign_batches(self, transcripts: DataFrame) -> DataFrame:
        """Deterministic batch id from the conv hash — every row of a batch
        is identified by data content, never by scheduling order."""
        return transcripts.withColumn(
            "batch_id",
            F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(self.num_batches)).cast("int"),
        )

    def transform_batch(self, batch: DataFrame) -> DataFrame:
        """parse → filter → unwind → enrich/route for one batch (the body
        of the reference's per-entry loop, TailCommand.java:552-764)."""
        parsed = parse_transcripts(batch, with_diff_stats=self.with_diff_stats)
        filtered = exclude_system_namespaces(parsed)
        unwound = unwind_applyops(filtered)
        return route_categories(unwound, self.tool_catalog)

    # -- run / resume ------------------------------------------------------
    def run(self, transcripts: DataFrame, fail_after_batch: int | None = None) -> dict:
        """Process all incomplete batches; returns the checkpoint state.

        ``fail_after_batch`` injects a crash after N batches (resume test
        hook — the kill stage of the reference's 3-stage shutdown drill,
        TailCommand.java:817-921).
        """
        state = self._load_checkpoint()
        with_batches = self._assign_batches(transcripts)
        done_this_run = 0
        for b in range(self.num_batches):
            if str(b) in state["completed"]:
                continue
            t0 = time.time()
            batch = with_batches.filter(F.col("batch_id") == b).drop("batch_id")
            routed = self.transform_batch(batch)
            out = os.path.join(self.routed_dir, f"batch={b}")
            # observe rows in/out without a second scan
            n_in = batch.count()
            routed.write.mode("overwrite").partitionBy("category").parquet(out)
            n_out = self.spark.read.parquet(out).count()
            state["completed"][str(b)] = {
                "rows_in": n_in,
                "rows_out": n_out,
                "path": out,
                "wall_sec": round(time.time() - t0, 3),
            }
            self._save_checkpoint(state)
            done_this_run += 1
            if fail_after_batch is not None and done_this_run >= fail_after_batch:
                raise RuntimeError(f"injected failure after batch {b}")
        return state

    def routed(self) -> DataFrame:
        """All routed rows across batches (category read back from the
        partition directory)."""
        return self.spark.read.option("basePath", self.routed_dir).parquet(
            os.path.join(self.routed_dir, "batch=*")
        )

    def final_aggregates(self) -> DataFrame:
        """Exact per-sink aggregates over the routed system of record —
        idempotent under resume."""
        return per_sink_aggregates(self.routed()).orderBy("category", "ns")

    def write_final_metrics(self) -> None:
        agg = self.final_aggregates().withColumn("kind", F.lit("per_sink_aggregate"))
        agg.write.mode("overwrite").parquet(os.path.join(self.metrics_dir, "final"))

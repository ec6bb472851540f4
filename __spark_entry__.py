"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``oplog_analyzer_spark`` (SURVEY.md §2 inventory);
this module is the thin registry the driver imports.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the core ns::op
    accumulator report (A1+O1 — EntryAccumulator.java:41-71,
    BaseOplogCommand.java:250-267)."""
    from oplog_analyzer_spark.entry_queries import a1_ns_op_report

    return a1_ns_op_report(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from oplog_analyzer_spark.entry_queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from oplog_analyzer_spark.entry_queries import all_oracles

    return all_oracles()

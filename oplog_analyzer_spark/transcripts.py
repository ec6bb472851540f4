"""Deterministic, distributed transcript-corpus generator.

The north_rule input (BASELINE.json input_hint) is an Iceberg/parquet table
of multi-turn conversation transcripts:
    (conv_id string, turn_idx int, role string, text string, tool string,
     ts timestamp)
This generator synthesizes that table *inside Spark* — ``spark.range`` plus
pure column expressions seeded by ``xxhash64`` — so generation itself scales
to 10^12 turns with no driver-side data and is bit-reproducible for any
(num_conversations, seed).

The embedded text layout is the grok target for the parse stage
(operators/parse.py), mirroring what the reference probes out of each oplog
entry (ts/ns/op/o/o2 — BaseOplogCommand.java:132-147, TailCommand.java:
552-764):

    ns=<db>.<coll> op:<i|u|d|c> id=<conv_id> <filler words...>
    [diff={"f0":..,"f1":[..],..}]          update-diff analog (o.diff)
    [sub:<ns>/<op>;<ns>/<op>;...]          applyOps batch analog (o.applyOps)

Skew: conversation 0 of every 1000 is "hot" with ``hot_turns`` turns
(hot-document pattern, reference README.md:500-516) — the generator is the
fixture for the salted-repartition path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLES = ["user", "assistant", "system", "tool"]
# role → op class, the role_catalog dimension (FIXTURES.md §2); the op set
# mirrors the reference's i/u/d/c op types (TailCommand.java:563-564)
ROLE_OP = {"user": "i", "assistant": "u", "system": "c", "tool": "d"}

_WORDS = [
    "the", "fast", "key", "order", "sort", "table", "scan", "merge", "part",
    "window", "small", "hash", "join", "batch", "stream", "spark", "filter",
    "row", "data", "slow", "group", "query", "value", "line", "agg", "big",
]


def _h(seed: int, *cols) -> F.Column:
    """Deterministic 64-bit hash stream: xxhash64 over (seed, cols)."""
    return F.xxhash64(F.lit(seed), *cols)


def _pick(seed: int, options: list[str], *cols) -> F.Column:
    """Pick one of ``options`` by hash — element_at is 1-based."""
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (F.pmod(_h(seed, *cols), F.lit(len(options))) + 1).cast("int"))


def generate_transcripts(
    spark: SparkSession,
    num_conversations: int = 500,
    turns_per_conv: int = 10,
    hot_every: int = 1000,
    hot_turns: int = 200,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Build the transcripts DataFrame.

    conv c gets ``turns_per_conv + (hash noise in 0..4)`` turns, except hot
    conversations (c % hot_every == 0) which get ``hot_turns``.  ts is
    strictly increasing per conversation (stable-ordering invariant
    fixture); text embeds ns / op / diff / sub tokens per the module doc.
    """
    convs = spark.range(0, num_conversations, 1, num_partitions or 32).select(
        F.col("id").alias("conv_no")
    )
    n_turns = F.when(
        F.pmod(F.col("conv_no"), F.lit(hot_every)) == 0, F.lit(hot_turns)
    ).otherwise(F.lit(turns_per_conv) + F.pmod(_h(seed + 1, F.col("conv_no")), F.lit(5)))
    convs = convs.withColumn("n_turns", n_turns)

    turns = convs.select(
        "conv_no",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    conv_no, turn_idx = F.col("conv_no"), F.col("turn_idx")
    # Three conv_id shapes exercise the id-normalization dispatch (P2,
    # BaseOplogCommand.java:170-226): plain string / hex-binary / numeric.
    shape = F.pmod(_h(seed + 2, conv_no), F.lit(10))
    conv_id = (
        F.when(shape < 7, F.format_string("c%08d", conv_no))
        .when(shape < 9, F.lower(F.hex(_h(seed + 3, conv_no))))
        .otherwise(conv_no.cast("string"))
    )

    role = _pick(seed + 4, ROLES, conv_no, turn_idx)
    op = (
        F.when(role == "user", "i")
        .when(role == "assistant", "u")
        .when(role == "system", "c")
        .otherwise("d")
    )
    ns = F.format_string(
        "db%d.coll%d",
        F.pmod(_h(seed + 5, conv_no), F.lit(4)),
        F.pmod(_h(seed + 6, conv_no, turn_idx), F.lit(8)),
    )
    # ~3% of rows get a system namespace to exercise F1 exclusion
    ns = F.when(F.pmod(_h(seed + 7, conv_no, turn_idx), F.lit(33)) == 0,
                F.lit("config.system.sessions")).otherwise(ns)

    # tool token; ~1% miss the catalog (left-join fallback fixture)
    tool = F.when(
        F.pmod(_h(seed + 8, conv_no, turn_idx), F.lit(100)) == 0,
        F.format_string("tx%02d", F.pmod(_h(seed + 9, conv_no, turn_idx), F.lit(5))),
    ).otherwise(
        F.format_string("t%02d", F.pmod(_h(seed + 10, conv_no, turn_idx), F.lit(20)))
    )

    # filler: 3–10 words picked deterministically
    n_words = (F.pmod(_h(seed + 11, conv_no, turn_idx), F.lit(8)) + 3).cast("int")
    words = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_words),
            lambda i: F.element_at(
                F.array(*[F.lit(w) for w in _WORDS]),
                (F.pmod(_h(seed + 12, conv_no, turn_idx, i), F.lit(len(_WORDS))) + 1).cast("int"),
            ),
        ),
        " ",
    )

    # diff block on update ops only (o.diff analog): nf fields, one of them
    # an array of ne ints, one a nested object — element counting target
    nf = (F.pmod(_h(seed + 13, conv_no, turn_idx), F.lit(4)) + 1).cast("int")
    ne = (F.pmod(_h(seed + 14, conv_no, turn_idx), F.lit(5)) + 1).cast("int")
    diff_json = F.concat(
        F.lit('{"f0":['),
        F.array_join(F.transform(F.sequence(F.lit(1), ne), lambda i: i.cast("string")), ","),
        F.lit('],"g":{"x":1}'),
        # sequence(2, nf) would run DESCENDING for nf < 2 — guard it
        F.when(
            nf >= 2,
            F.array_join(
                F.transform(
                    F.sequence(F.lit(2), nf),
                    lambda i: F.concat(F.lit(',"f'), i.cast("string"), F.lit('":1')),
                ),
                "",
            ),
        ).otherwise(F.lit("")),
        F.lit("}"),
    )
    diff_part = F.when(op == "u", F.concat(F.lit(" diff="), diff_json)).otherwise(F.lit(""))

    # applyOps batch analog on ~ half of command ops: k sub-ops "ns/op;..."
    k_sub = (F.pmod(_h(seed + 15, conv_no, turn_idx), F.lit(3)) + 2).cast("int")
    subs = F.array_join(
        F.transform(
            F.sequence(F.lit(1), k_sub),
            lambda i: F.concat(
                F.format_string("db%d.sub%d",
                                F.pmod(_h(seed + 16, conv_no, turn_idx), F.lit(4)),
                                F.pmod(_h(seed + 17, conv_no, turn_idx, i), F.lit(4))),
                F.lit("/"),
                F.when(F.pmod(_h(seed + 18, conv_no, turn_idx, i), F.lit(2)) == 0, "i").otherwise("u"),
            ),
        ),
        ";",
    )
    sub_part = F.when(
        (op == "c") & (F.pmod(_h(seed + 19, conv_no, turn_idx), F.lit(2)) == 0),
        F.concat(F.lit(" sub:"), subs),
    ).otherwise(F.lit(""))

    text = F.concat(
        F.lit("ns="), ns, F.lit(" op:"), op, F.lit(" id="), conv_id,
        F.lit(" "), words, diff_part, sub_part,
    )

    # strictly increasing ts per conversation: per-turn step 60 s plus
    # jitter < 60 s keyed on the turn — monotone by construction
    base = F.lit("2025-01-01 00:00:00").cast("timestamp")
    offset_sec = (
        conv_no * 7 + turn_idx * 60 + F.pmod(_h(seed + 20, conv_no, turn_idx), F.lit(59))
    )
    ts = F.timestamp_add("SECOND", offset_sec.cast("long"), base)

    return turns.select(
        conv_id.alias("conv_id"),
        turn_idx.cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


def tool_catalog(spark: SparkSession) -> DataFrame:
    """Broadcast enrich dimension (FIXTURES.md §2): 20 tools → 6 routing
    categories; analog of config.collections shard-key metadata
    (SampleCommand.java:452-475)."""
    cats = ["search", "code", "files", "web", "math", "chat"]
    rows = ", ".join(
        f"('t{i:02d}', '{cats[i % len(cats)]}', {round(0.1 + 0.045 * i, 3)})"
        for i in range(20)
    )
    # VALUES → LocalRelation: broadcasting it is driver-local, no RDD job
    # (createDataFrame(list) scans a Python RDD — one Python worker per
    # slice just to read 20 rows, measured ~10 s per broadcast)
    return spark.sql(f"SELECT * FROM VALUES {rows} AS t(tool, category, weight)")


def role_catalog(spark: SparkSession) -> DataFrame:
    rows = ", ".join(f"('{r}', '{ROLE_OP[r]}')" for r in ROLES)
    return spark.sql(f"SELECT * FROM VALUES {rows} AS t(role, op_class)")


def doc_sizes(spark: SparkSession, transcripts: DataFrame, seed: int = 42) -> DataFrame:
    """J1 lookup fixture: actual sizes for ~90% of conv_ids
    (fetchDocSizes analog, TailCommand.java:398-463)."""
    ids = transcripts.select("conv_id").distinct()
    keep = F.pmod(F.xxhash64(F.lit(seed + 30), F.col("conv_id")), F.lit(10)) != 0
    return ids.filter(keep).withColumn(
        "actual_size",
        (F.pmod(F.xxhash64(F.lit(seed + 31), F.col("conv_id")), F.lit(4000)) + 100).cast("long"),
    )

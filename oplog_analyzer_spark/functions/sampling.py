"""Deterministic sampling / dataset-split primitives for training-data
pipelines.

A 10^12-row corpus needs train/val/test splits and per-stratum samples
that are (a) reproducible run-to-run, (b) invariant to partitioning and
row order, (c) stable under incremental reprocessing — a document keeps
its split when the corpus is re-read, re-partitioned, or grown.  RNG-based
``df.sample`` gives none of that; hashing the stable id gives all three.

Scale posture: ``hash_split`` and ``stratified_sample_fraction`` are pure
narrow maps (one xxhash64 + compare per row, whole-stage codegen, no
shuffle, no Python).  ``stratified_sample_quota`` needs exact per-stratum
counts, so it shuffles once on the stratum key through a ranked window —
use the fraction form when an approximate per-stratum rate is acceptable
at scale.

Hash choice (``hash_fn``): the default ``"xxhash64"`` is JVM-native and
fastest, but has no twin in other engines; ``"md5"`` derives the bucket
from the first 8 hex digits of md5(seed ":" id) — byte-identical in any
engine with a standard md5 (DuckDB: ``md5('<seed>:' || CAST(id AS
VARCHAR))``), which makes every split/sample assignment independently
certifiable by SQL oracle.  Both are narrow codegen'd maps; all
determinism/invariance properties hold for either.  The xxhash64 form's
invariants (determinism, partition/order invariance,
disjoint-and-complete, proportion tolerance, exact quotas) are
pytest-verified in tests/test_functions.py; the md5 form is additionally
driver-oracled end-to-end.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# xxhash64 output spans the full signed-64 range; bucket to [0, 10^6) for
# weight resolution of 1e-6 without float boundaries.
_BUCKETS = 1_000_000


def _hash_bucket(id_col: str, seed: int, hash_fn: str = "xxhash64") -> F.Column:
    # NULL ids hash to NULL (functions/hashing.py contract): they take the
    # fall-through split label and drop out of hash-threshold filters,
    # exactly as the SQL twin behaves.
    from .hashing import seeded_hash

    return F.pmod(seeded_hash(seed, F.col(id_col), hash_fn), F.lit(_BUCKETS))


def md5_bucket_sql(id_sql: str, seed: int = 42) -> str:
    """The DuckDB-dialect twin of ``_hash_bucket(..., hash_fn='md5')`` —
    kept beside the Spark form so the two expressions can't drift."""
    return (
        f"CAST(('0x' || substr(md5('{seed}:' || CAST({id_sql} AS VARCHAR)), 1, 8)) "
        f"AS BIGINT) % {_BUCKETS}"
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    seed: int = 42,
    out_col: str = "split",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Assign every row a deterministic split label by hashing its stable
    id: ``weights`` name→fraction (must sum to ≤ 1; any remainder falls in
    the LAST label).  The assignment is a pure function of (id, seed) —
    repartitioning, reordering, or growing the corpus never moves an
    existing row between splits, which is what keeps eval sets
    uncontaminated across pipeline re-runs.
    """
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    if not weights:
        raise ValueError("weights must be non-empty")
    total = sum(weights.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"weights sum to {total} > 1")
    bucket = _hash_bucket(id_col, seed, hash_fn)
    expr = None
    edge = 0.0
    names = list(weights)
    for name in names[:-1]:
        edge += weights[name]
        cond = bucket < F.lit(int(round(edge * _BUCKETS)))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def stratified_sample_fraction(
    df: DataFrame,
    strata_cols: list[str],
    fractions: dict | float,
    id_col: str = "doc_id",
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Keep ~fraction of each stratum by hash threshold — deterministic,
    shuffle-free, and each stratum's kept set is a SUBSET of any larger
    fraction's kept set (nested samples: raising 1% → 10% only adds rows,
    never swaps them).  ``fractions`` is one float for all strata or a
    {stratum-value-tuple or scalar: fraction} map over ``strata_cols``
    values (unlisted strata are dropped).

    Plan shape: small maps (≤64 strata) compile to one codegen'd OR chain
    — still a narrow map.  Larger maps (a per-language or per-domain
    policy can run to thousands of strata) switch to a broadcast inner
    join against a threshold dimension: same semantics, same narrow
    pipeline after the broadcast, and the plan stays O(1) in the map size
    instead of a thousands-node boolean tree."""
    bucket = _hash_bucket(id_col, seed, hash_fn)
    if isinstance(fractions, dict):
        if len(fractions) <= 64:
            key = (
                F.col(strata_cols[0])
                if len(strata_cols) == 1
                else F.struct(*[F.col(c) for c in strata_cols])
            )
            cond = F.lit(False)
            for val, frac in fractions.items():
                lit_val = (
                    F.struct(*[F.lit(v) for v in val])
                    if isinstance(val, tuple)
                    else F.lit(val)
                )
                cond = cond | ((key == lit_val) & (bucket < int(round(frac * _BUCKETS))))
            return df.filter(cond)
        if "__thresh" in df.columns:
            # the join introduces a __thresh threshold column; an input
            # already carrying one would silently shadow it (ADVICE r04)
            raise ValueError(
                "input already has a '__thresh' column — rename it before "
                "stratified_sample_fraction's broadcast path"
            )
        spark = df.sparkSession
        dim_rows = [
            (*(val if isinstance(val, tuple) else (val,)), int(round(frac * _BUCKETS)))
            for val, frac in fractions.items()
        ]

        # VALUES-literal dim, not createDataFrame(list): a Python-RDD-backed
        # dim pays one Python worker per slice every time it broadcasts
        def lit_sql(v) -> str:
            if isinstance(v, str):
                return "'" + v.replace("'", "''") + "'"
            if isinstance(v, bool) or not isinstance(v, (int, float)):
                raise TypeError(f"unsupported stratum value {v!r}")
            if isinstance(v, float) and not math.isfinite(v):
                # repr(inf/nan) is not valid SQL (ADVICE r04)
                raise ValueError(f"non-finite stratum value {v!r}")
            return repr(v)

        rows_sql = ", ".join(
            "(" + ", ".join(lit_sql(x) for x in row) + ")" for row in dim_rows
        )
        cols_sql = ", ".join([*strata_cols, "__thresh"])
        dim = spark.sql(f"SELECT * FROM VALUES {rows_sql} AS t({cols_sql})")
        joined = df.join(F.broadcast(dim), on=strata_cols, how="inner")
        # re-project to df's column order: the join moves the join keys
        # first, and output schema must not depend on which path ran
        # (the ADVICE-r03 routed() bug class)
        return joined.filter(bucket < F.col("__thresh")).select(*df.columns)
    return df.filter(bucket < int(round(float(fractions) * _BUCKETS)))


def stratified_sample_quota(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    id_col: str = "doc_id",
    seed: int = 42,
    prefilter_safety: float | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, chosen by deterministic
    hash order — rank key (hash_bucket, id), the W1 ranked-window shape.
    Deterministic and order-invariant like the fraction form, but NOT
    nested across different n.

    Scale path: the plain window puts a WHOLE stratum in one task and
    sorts it — fine up to millions of rows per stratum, a spill-heavy
    straggler at 10^9.  ``prefilter_safety`` (e.g. 8.0) first drops each
    stratum to the hash-bucket prefix that keeps ~safety×n rows (one
    count aggregate + a broadcast threshold join — both narrow/tiny), and
    only the survivors enter the window.  Because the prefilter cuts on a
    PREFIX of the same (hash_bucket, id) rank order, the final rows are
    IDENTICAL to the exact path whenever ≥ n rows survive; the undershoot
    probability is Chernoff-bounded (Binomial(cnt, safety·n/cnt) < n —
    at safety 8 and n 50 that is < 1e-30), and strata smaller than
    safety·n keep probability 1 and bypass the risk entirely.  Default
    None = exact single-window form."""
    bucket = _hash_bucket(id_col, seed, hash_fn)
    base = df
    if prefilter_safety is not None and prefilter_safety > 0:
        counts = df.groupBy(*strata_cols).agg(F.count(F.lit(1)).alias("__cnt"))
        keep_p = F.least(
            F.lit(1.0),
            F.lit(float(prefilter_safety * n_per_stratum)) / F.col("__cnt"),
        )
        thresholds = counts.select(
            *strata_cols,
            F.ceil(keep_p * _BUCKETS).cast("long").alias("__keep_below"),
        )
        base = (
            df.join(F.broadcast(thresholds), on=strata_cols, how="inner")
            .filter(bucket < F.col("__keep_below"))
            .select(*df.columns)
        )
    w = Window.partitionBy(*strata_cols).orderBy(bucket, F.col(id_col))
    return (
        base.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


def domain_mixture_thresholds(
    token_totals: dict, weights: dict, buckets: int = _BUCKETS
) -> dict:
    """Integer-exact per-domain hash thresholds realizing a target TOKEN
    mixture without upsampling.

    Given per-domain token totals T_d and integer mixture shares w_d, the
    largest achievable corpus keeps fraction f_d = (w_d / T_d) ·
    min_e(T_e / w_e) of each domain (the binding domain — smallest
    tokens-per-share — keeps everything; every other domain is thinned to
    hold the ratio).  Because floor is monotone it commutes with min, so

        thresh_d = min_e floor( buckets · w_d · T_e / (w_e · T_d) )

    — pure integer arithmetic end to end (Python ints here, HUGEINT in the
    SQL twin), no binding-domain argmax with float tie-breaking, and the
    e = d term pins the binding domain to exactly ``buckets``.

    Domains in ``weights`` but absent (or zero-token) in the data raise —
    a silent 0 would make every OTHER domain's target collapse to zero.
    Domains in the data but not in ``weights`` are dropped by the sampler,
    matching stratified_sample_fraction's unlisted-stratum contract.
    """
    missing = [d for d in weights if not token_totals.get(d)]
    if missing:
        raise ValueError(
            f"domains {missing} have no tokens in the corpus — a zero "
            "total would zero out every other domain's target; drop them "
            "from the mixture or fix the corpus"
        )
    bad = {d: w for d, w in weights.items() if not isinstance(w, int) or w <= 0}
    if bad:
        raise ValueError(
            f"mixture shares must be positive ints (exactness contract), "
            f"got {bad}"
        )
    return {
        d: min(
            (buckets * weights[d] * token_totals[e]) // (weights[e] * token_totals[d])
            for e in weights
        )
        for d in weights
    }


def domain_mixture_sample(
    df: DataFrame,
    domain_col: str,
    weights: dict,
    id_col: str = "doc_id",
    token_col: str | None = None,
    text_col: str = "text",
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Sample the corpus so each domain contributes its ``weights`` share
    of TOKENS — the data-mixing step of a training pipeline ("50 shares
    web, 30 books, 20 code"), downsampling only.

    Two passes by nature (the mixture depends on global totals):

      pass 1  per-domain token totals — one map-side-combinable aggregate,
              result is #domains rows (dozens), collected to the driver
              for EXACT integer threshold arithmetic
              (:func:`domain_mixture_thresholds`; a decimal-division plan
              would risk Spark's scale-38 truncation at 100 TB products);
      pass 2  hash-threshold filter, same narrow codegen map as
              stratified_sample_fraction (rows never migrate between
              reruns; nested-sample property holds per domain).

    Cache ``df`` when the upstream is expensive — both passes read it.
    Row-level hash sampling hits the token share in expectation (doc
    lengths are independent of the hash); exact token quotas would need
    the ranked-window form and a full shuffle.
    """
    if token_col is None:
        from .textstats import tokens

        with_tokens = df.withColumn("__n_tok", F.size(tokens(text_col)))
        token_col_eff = "__n_tok"
    else:
        with_tokens = df
        token_col_eff = token_col
    totals = {
        r["d"]: r["t"]
        for r in with_tokens.groupBy(F.col(domain_col).alias("d"))
        .agg(F.sum(token_col_eff).alias("t"))
        .collect()
        if r["d"] in weights
    }
    thresholds = domain_mixture_thresholds(totals, weights)
    bucket = _hash_bucket(id_col, seed, hash_fn)
    cond = F.lit(False)
    for dom, thresh in sorted(thresholds.items()):
        cond = cond | ((F.col(domain_col) == F.lit(dom)) & (bucket < F.lit(thresh)))
    return df.filter(cond)


def temperature_factors(
    doc_counts: dict, alpha: float, budget: int | None = None
) -> dict:
    """Per-domain replication factor in micro-units for temperature-based
    α-sampling (the multilingual mixing rule published with T5/mT5:
    sample domain d with probability ∝ n_d^α, α<1 boosting low-resource
    domains).  Returns ``{domain: r_micro}`` where a doc of domain d is
    materialized ``r_micro // 1e6`` times plus one more copy with
    probability ``(r_micro % 1e6) / 1e6``.

    Exactness contract (the domain_mixture_thresholds discipline): the
    ONLY float step is the per-domain weight ``w_micro_d = floor(1e6 ·
    exp(α · ln n_d))`` — one ln and one exp on identical inputs in any
    engine, micro-floored so a verdict flip needs the true value within
    ~1e-10 of an integer.  Everything downstream is exact big-integer
    arithmetic: ``r_micro_d = (B · w_micro_d · 1e6) // (W · n_d)`` with
    ``W = Σ w_micro_d`` (an INTEGER total, so no float-sum-order
    dependence across engines) and ``B`` the output budget in docs
    (default: corpus size — epoch-preserving).  Expected output =
    ``Σ n_d · r_d ≈ B`` with domain shares ∝ n_d^α.

    α = 1 degenerates to r ≈ 1 everywhere; α = 0 equalizes domains;
    α < 0 raises (a negative exponent inverts the mixture — surely a
    bug upstream)."""
    import math

    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    bad = {d: n for d, n in doc_counts.items() if not isinstance(n, int) or n <= 0}
    if bad:
        raise ValueError(f"doc counts must be positive ints, got {bad}")
    if not doc_counts:
        raise ValueError("empty doc_counts")
    n_total = sum(doc_counts.values())
    b = n_total if budget is None else budget
    if not isinstance(b, int) or b <= 0:
        raise ValueError(f"budget must be a positive int, got {budget}")
    w_micro = {
        d: math.floor(1e6 * math.exp(alpha * math.log(n)))
        for d, n in doc_counts.items()
    }
    w_tot = sum(w_micro.values())
    return {
        d: (b * w_micro[d] * 1_000_000) // (w_tot * doc_counts[d])
        for d in doc_counts
    }


def temperature_upsample(
    df: DataFrame,
    domain_col: str,
    alpha: float,
    id_col: str = "doc_id",
    budget: int | None = None,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    out_col: str = "copy_idx",
) -> DataFrame:
    """Materialize a temperature-mixed epoch: every row is replicated
    ``n_copies`` times per :func:`temperature_factors` (base copies + one
    deterministic hash-threshold extra), with ``out_col`` numbering the
    replicas 0..n_copies−1 so downstream packing/shuffling can tell them
    apart.  Domains with r < 1 (the high-resource side at α < 1) thin
    stochastically through the same rule — one op realizes both
    directions of the mixture.

    Two passes like :func:`domain_mixture_sample` (the factors depend on
    global counts): pass 1 is one map-side-combinable count collected at
    #domains rows; pass 2 is a narrow codegen map — the per-domain
    (base, frac) pairs compile into one CASE chain (no join), the copy
    array is MATERIALIZED in its own projection before the explode (the
    InferFiltersFromGenerate re-stamping trap, functions/dedup.py note),
    and the explode's output is ≈ budget rows whatever α does.  Rows
    with a NULL or unseen domain drop (the unlisted-stratum contract);
    rows with a NULL id hash to NULL and drop with them."""
    counts = {
        r["d"]: r["n"]
        for r in df.groupBy(F.col(domain_col).alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
        if r["d"] is not None
    }
    factors = temperature_factors(counts, alpha, budget)
    bucket = _hash_bucket(id_col, seed, hash_fn)
    n_copies = F.lit(None).cast("long")
    for dom, r_micro in sorted(factors.items()):
        base, frac = divmod(r_micro, 1_000_000)
        n_copies = F.when(
            F.col(domain_col) == F.lit(dom),
            F.lit(base) + (bucket < F.lit(frac)).cast("long"),
        ).otherwise(n_copies)
    with_arr = (
        df.withColumn("__n_copies", n_copies)
        .filter(F.col("__n_copies") > 0)
        .withColumn("__copies", F.sequence(F.lit(0), F.col("__n_copies") - 1))
    )
    return (
        with_arr.select("*", F.explode_outer("__copies").alias(out_col))
        .filter(F.col(out_col).isNotNull())
        .drop("__n_copies", "__copies")
    )


def uniform_sample_k(
    df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """EXACT-k deterministic uniform sample without replacement: keep the
    k rows whose ``(seeded_hash(id), id)`` rank lowest — the
    carve-out-an-eval-subset primitive the fraction samplers can't give
    you (hash thresholds hit k only in expectation).  Like every hash
    form here the membership is a pure function of (ids, seed) only while
    the corpus is fixed: at exact-k, adding rows CAN evict prior members
    (the k-th threshold moves) — use stratified_sample_fraction when
    grow-stability matters more than exact cardinality.

    Plan (the dsir_selected pattern): one distributed TakeOrdered of the
    k-th (hash, id) threshold — a bounded k-row collect of two scalars —
    then a broadcast struct compare; no global sort, no single-partition
    window.  Fewer than k rows ⇒ everything; NULL ids hash to NULL and
    are never selected (functions/hashing.py contract).  ``k <= 0``
    raises."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    from .hashing import seeded_hash

    h = seeded_hash(seed, F.col(id_col), hash_fn)
    key = F.struct(h.alias("h"), F.col(id_col).alias("i"))
    kth = (
        df.filter(F.col(id_col).isNotNull())
        .select(key.alias("k"))
        .orderBy("k")
        .limit(k)
        .agg(F.max("k").alias("kth"))
        .collect()[0]["kth"]
    )
    if kth is None:  # empty input
        return df.filter(F.lit(False))
    thr = F.struct(F.lit(kth["h"]).alias("h"), F.lit(kth["i"]).alias("i"))
    return df.filter(F.col(id_col).isNotNull() & (key <= thr))


def token_budget_sample(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    n_buckets: int = 256,
) -> DataFrame:
    """Carve a corpus by TOKEN budget: walk the docs in a deterministic
    pseudo-random order and keep each doc whose predecessors total fewer
    than ``budget`` tokens — "take until full", the crossing doc included
    (kept total overshoots by less than one document).  This is how a
    training subset is actually sized — in tokens, not docs (exact-k and
    fraction samplers can't see document length).

    The carve order is (bucket, hash, id) with ``bucket = hash mod
    n_buckets`` — bucket-major, but every level is a pure function of
    (id, seed), so the order is still a deterministic uniform permutation
    and membership is reproducible.

    Scale shape — the naive form is ONE global cumulative-sum window
    (single-partition sort of the corpus); this instead runs the
    distributed prefix-sum decomposition:

      1. per-bucket token totals — one map-side-combinable aggregate,
         ``n_buckets`` rows collected;
      2. the driver prefixes them in bucket order: buckets whose prefix
         END ≤ budget are kept whole, buckets starting ≥ budget drop
         whole — a narrow ``isin`` filter, no sort, no window;
      3. at most ONE boundary bucket gets the cumulative window, sized
         corpus/n_buckets (raise ``n_buckets`` with the corpus so the
         boundary partition stays bounded).

    NULL ids hash to NULL and drop (hashing contract); ``budget ≤ 0``
    keeps nothing; ``budget ≥`` the corpus total keeps everything."""
    from .hashing import seeded_hash

    if tokens_col is None:
        from .textstats import tokens

        t = df.withColumn("__n", F.size(tokens(text_col)).cast("long"))
    else:
        t = df.withColumn("__n", F.col(tokens_col).cast("long"))
    h = seeded_hash(seed, F.col(id_col), hash_fn)
    t = (
        t.withColumn("__h", h)
        .filter(F.col("__h").isNotNull())
        .withColumn("__b", F.pmod(F.col("__h"), F.lit(n_buckets)).cast("int"))
    )

    sums = {
        r["b"]: r["s"]
        for r in t.groupBy(F.col("__b").alias("b"))
        .agg(F.sum("__n").alias("s"))
        .collect()
    }
    full, boundary, running = [], None, 0
    for b in sorted(sums):
        if running >= budget:
            break
        # STRICT < for the whole-bucket keep (ADVICE r06): a bucket whose
        # prefix END == budget must be the boundary bucket, because a
        # zero-token doc at its end has predecessor-sum == budget and the
        # documented 'cumulative < budget' rule (and the SQL twin) drops
        # it — the <= fast path kept it
        if running + sums[b] < budget:
            full.append(b)
        else:
            boundary = b
        running += sums[b]
        if boundary is not None:
            break
    prefix_at_boundary = running - (sums[boundary] if boundary is not None else 0)

    kept = t.filter(F.col("__b").isin(full)) if full else t.filter(F.lit(False))
    if boundary is not None:
        w = (
            Window.partitionBy("__b")
            .orderBy("__h", id_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        edge = (
            t.filter(F.col("__b") == boundary)
            .withColumn("__cumb", F.coalesce(F.sum("__n").over(w), F.lit(0)))
            .filter(F.col("__cumb") + F.lit(prefix_at_boundary) < F.lit(budget))
            .drop("__cumb")
        )
        kept = kept.unionByName(edge)
    return kept.drop("__h", "__b", "__n")


def score_quantile_buckets(
    df: DataFrame,
    score_col: str,
    n_buckets: int = 3,
    out_col: str = "qbucket",
    max_distinct: int = 1_000_000,
) -> DataFrame:
    """Assign every row its score quantile bucket 0..n_buckets−1 (the
    CCNet head/middle/tail pattern: partition a corpus by a quality
    score, then mix or gate per band; Wenzek et al. 2020 use perplexity
    tertiles — here any score works, e.g. ``trigram_cov_x10000`` or the
    Gopher features, all of which follow this repo's bounded fixed-point
    convention).

    EXACT quantiles without the global sort an ``ntile`` window costs:
    integer fixed-point scores have a BOUNDED value domain, so the full
    score distribution is one map-side-combinable ``groupBy(score).
    count()`` — at most ``max_distinct`` rows (raise if exceeded: a
    float/unbounded score belongs in approx_percentile territory, not
    here), collected and prefixed driver-side into threshold values.
    Bucket edges are VALUE thresholds: threshold_q = the smallest score
    whose cumulative count reaches ceil(n·q/n_buckets), and a row's
    bucket = #{q : score > threshold_q} — all ties of a boundary value
    land in ONE bucket (sizes skew only by tie mass; deterministic, and
    the definition any SQL engine reproduces).  NULL scores get a NULL
    bucket.  The assignment itself is a narrow codegen'd CASE chain —
    no shuffle, no window, no Python."""
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    hist = (
        df.filter(F.col(score_col).isNotNull())
        .groupBy(F.col(score_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy("s")
        .limit(max_distinct + 1)
        .collect()
    )
    if len(hist) > max_distinct:
        raise ValueError(
            f"{score_col} has more than max_distinct={max_distinct} "
            "distinct values — the bounded-domain histogram only fits "
            "fixed-point scores; pre-quantize or raise max_distinct"
        )
    n = sum(r["c"] for r in hist)
    if n == 0:
        return df.withColumn(out_col, F.lit(None).cast("int"))
    thresholds = []
    run, q = 0, 1
    for r in hist:
        run += r["c"]
        while q < n_buckets and run >= -(-n * q // n_buckets):
            thresholds.append(r["s"])
            q += 1
    bucket = F.lit(0)
    for t in thresholds:
        bucket = bucket + (F.col(score_col) > F.lit(t)).cast("int")
    return df.withColumn(
        out_col,
        F.when(F.col(score_col).isNotNull(), bucket).cast("int"),
    )

"""Tests for dedup / similarity / textstats / multimodal, including the
hash-based operators that have no driver-side SQL oracle (planted-duplicate
fixtures + an independent DuckDB implementation of the full pipeline)."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from oplog_analyzer_spark.functions import dedup as D
from oplog_analyzer_spark.functions import multimodal as M
from oplog_analyzer_spark.functions import similarity as S
from oplog_analyzer_spark.functions import textstats as TS


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the old river bank"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("lazy", "sleepy")),  # near dup of 0
        (3, "completely different text about spark shuffle partitions and joins"),
        (4, "  THE  quick   brown fox jumps over the lazy dog near the old river bank "),
        (5, "short text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    out = {r["keep_id"]: r["dup_count"] for r in D.exact_dedup(docs).collect()}
    # 0, 1 and 4 normalize to the same text → keep 0, count 3
    assert out[0] == 3
    assert out[2] == 1 and out[3] == 1 and out[5] == 1


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in D.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert (0, 1) in pairs  # identical
    assert (0, 2) in pairs  # one word changed
    assert not any(3 in p for p in pairs)  # unrelated doc never pairs


def test_minhash_lsh_finds_near_dup(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in D.minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert (0, 1) in pairs
    assert (0, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_minhash_jaccard_estimate_matches_exact(docs):
    """The verified inter/uni from the LSH path equals exact shingle-set
    jaccard (the LSH part only prunes candidates, never changes values)."""
    got = {
        (r["id_a"], r["id_b"]): (r["inter"], r["uni"])
        for r in D.minhash_lsh_pairs(docs, threshold=0.1).collect()
    }
    exact = {
        (r["id_a"], r["id_b"]): (r["inter"], r["uni"])
        for r in D.ngram_jaccard_pairs(docs, threshold=0.1).collect()
    }
    for k, v in got.items():
        assert exact[k] == v


def test_minhash_max_bucket_caps_identical_doc_flood(spark, docs):
    """50 byte-identical docs share every band hash → one hot bucket whose
    self-join is quadratic (1225 pairs).  max_bucket bounds it: per (band,
    bucket) at most cap members pair up, results identical across runs,
    and true near-dups among DISTINCT docs are unaffected.  The cap order
    is BAND-DEPENDENT (ADVICE r03): each of the 8 bands keeps a different
    10-member subset, so far more than 10 clones appear in some candidate
    pair — under the old band-independent hash exactly the same 10
    survived every band and the other 40 were never paired (hence never
    deduped) at all."""
    flood = spark.createDataFrame(
        [(1000 + i, "clone clone clone of the very same document text body") for i in range(50)],
        "doc_id long, text string",
    )
    df = docs.unionAll(flood)
    capped1 = D.minhash_lsh_pairs(df, threshold=0.5, max_bucket=10)
    capped2 = D.minhash_lsh_pairs(df, threshold=0.5, max_bucket=10)
    rows1 = sorted(map(tuple, capped1.collect()))
    assert rows1 == sorted(map(tuple, capped2.collect()))
    clone_pairs = [(a, b) for a, b, *_ in rows1 if a >= 1000 and b >= 1000]
    # per band at most C(10,2)=45 clone pairs → ≤ 8×45=360 distinct pairs
    # across the 8 bands, a hard ceiling far below the uncapped 1225
    assert 0 < len(clone_pairs) <= 360
    # cross-band reconnection: the union of per-band cap sets covers many
    # more clones than one band's 10 — these all get transitively deduped
    clone_members = {x for p in clone_pairs for x in p}
    assert len(clone_members) > 20
    # the planted near-dups among distinct docs still surface
    pairs = {(a, b) for a, b, *_ in rows1}
    assert (0, 1) in pairs and (0, 2) in pairs


def test_embedding_neardup_production_threshold(spark):
    """The production threshold=0.9 path on planted vectors: one pair above
    0.9, one in [0.4, 0.9) that must be excluded (keeps the 0.9 branch
    covered now that the driver oracle runs at 0.4 — ADVICE r02)."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.14, 0.0, 0.0]),   # cosine ≈ 0.990 vs id 0
        (2, [0.6, 0.8, 0.0, 0.0]),     # cosine 0.6 vs id 0 — below 0.9
        (3, [0.0, 0.0, 1.0, 0.0]),     # orthogonal
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r["id_a"], r["id_b"]) for r in D.embedding_neardup_pairs(df, threshold=0.9).collect()}
    assert got == {(0, 1)}


def test_simhash_near_dup(spark):
    # simhash needs enough tokens for per-bit majority votes to be stable;
    # one word changed out of ~50 → hamming ≈ 1, unrelated doc ≈ 28
    base = " ".join(
        [
            "the quick brown fox jumps over the lazy dog near the old river bank",
            "and the wind moves slowly across the quiet green valley floor",
            "while distant birds call from tall pine trees beyond the ridge",
            "as evening light settles gently over the small sleeping town",
        ]
    )
    rows = [
        (0, base),
        (1, base),
        (2, base.replace("lazy", "sleepy")),
        (3, "completely different text about spark shuffle partitions and joins"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in D.simhash_pairs(df, max_hamming=3).collect()
    }
    assert pairs[(0, 1)] == 0  # identical text → identical fingerprint
    assert pairs[(0, 2)] <= 3  # one-word change → tiny hamming distance
    assert not any(3 in p for p in pairs)


# --- md5 hash mode (the driver-oracled family): same pipeline, SQL-
#     reproducible hash — the two modes must agree on every property that
#     does not depend on the hash family itself -----------------------------


def test_minhash_md5_mode_finds_near_dup(docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_lsh_pairs(
            docs, num_hashes=16, bands=4, threshold=0.5, hash_fn="md5"
        ).collect()
    }
    assert (0, 1) in pairs
    assert (0, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_minhash_md5_verify_matches_exact_jaccard(docs):
    """Candidate pruning differs by hash family; the VERIFIED inter/uni
    values must equal exact shingle-set jaccard in both modes."""
    exact = {
        (r["id_a"], r["id_b"]): (r["inter"], r["uni"])
        for r in D.ngram_jaccard_pairs(docs, threshold=0.1).collect()
    }
    for hash_fn in ("xxhash64", "md5", "numpy"):
        got = {
            (r["id_a"], r["id_b"]): (r["inter"], r["uni"])
            for r in D.minhash_lsh_pairs(
                docs, num_hashes=16, bands=4, threshold=0.1, hash_fn=hash_fn
            ).collect()
        }
        for k, v in got.items():
            assert exact[k] == v, (hash_fn, k)


def test_minhash_md5_duckdb_twin(docs):
    """The generated oracle SQL reproduces the md5-mode pipeline exactly on
    an in-memory corpus — locks the Spark/DuckDB twin before the driver
    runs it at sf0.01."""
    from oplog_analyzer_spark.entry_queries import _minhash_md5_oracle

    pdf = docs.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    oracle = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(
            _minhash_md5_oracle(num_hashes=16, bands=4, threshold=0.5)
        ).fetchall()
    }
    got = {
        (r["id_a"], r["id_b"]): (r["inter"], r["uni"])
        for r in D.minhash_lsh_pairs(
            docs, num_hashes=16, bands=4, threshold=0.5, hash_fn="md5"
        ).collect()
    }
    assert got == oracle and got  # non-vacuous


def test_seeded_hash_col_equals_literal_seed(docs):
    """hashing.seeded_hash_col (seed as a transform lambda variable /
    column) must agree with seeded_hash (seed as a python literal) for
    every int seed in BOTH families — the value contract that lets minhash
    signatures ride one sequence-transform instead of num_hashes stamped
    expression copies (the r6 expression-shape fix)."""
    from pyspark.sql import functions as F

    from oplog_analyzer_spark.functions.hashing import seeded_hash, seeded_hash_col

    def _by_col_seed(fam):
        # one-parameter closure: a `lambda i, fam=fam:` form would count as
        # two parameters and F.transform would bind the ARRAY INDEX to fam
        return lambda i: seeded_hash_col(i, F.col("text"), fam)

    lit_cols, col_cols = [], []
    for fam in ("xxhash64", "md5"):
        lit_cols.append(
            F.array(*[seeded_hash(i, F.col("text"), fam) for i in range(8)])
        )
        col_cols.append(
            F.transform(F.sequence(F.lit(0), F.lit(7)), _by_col_seed(fam))
        )
    mismatches = (
        docs.select(
            (lit_cols[0] == col_cols[0]).alias("xx"),
            (lit_cols[1] == col_cols[1]).alias("md"),
        )
        .filter(~F.col("xx") | ~F.col("md"))
        .count()
    )
    assert mismatches == 0


def test_simhash_halves_duckdb_twin(docs):
    from oplog_analyzer_spark.entry_queries import _simhash_md5_oracle

    pdf = docs.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    oracle = {r[0]: (r[1], r[2]) for r in con.execute(_simhash_md5_oracle()).fetchall()}
    got = {
        r["id"]: (r["sim_lo"], r["sim_hi"])
        for r in D.simhash_halves(docs).collect()
    }
    assert got == oracle
    for lo, hi in got.values():  # both halves 32-bit non-negative
        assert 0 <= lo < 2**32 and 0 <= hi < 2**32


def test_simhash_halves_near_dup_property(spark):
    """Same majority-vote behavior as the xxhash64 simhash: identical text
    → identical halves; one-word change → tiny hamming; unrelated → far."""
    base = " ".join(
        [
            "the quick brown fox jumps over the lazy dog near the old river bank",
            "and the wind moves slowly across the quiet green valley floor",
            "while distant birds call from tall pine trees beyond the ridge",
            "as evening light settles gently over the small sleeping town",
        ]
    )
    rows = [
        (0, base),
        (1, base),
        (2, base.replace("lazy", "sleepy")),
        (3, "completely different text about spark shuffle partitions and joins"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = {r["id"]: (r["sim_lo"], r["sim_hi"]) for r in D.simhash_halves(df).collect()}

    def hamming(a, b):
        return bin(fp[a][0] ^ fp[b][0]).count("1") + bin(fp[a][1] ^ fp[b][1]).count("1")

    assert hamming(0, 1) == 0
    # one token changed out of ~50: a handful of the 64 majority votes flip
    # (measured 5 in the md5 family); unrelated text lands near 32.
    assert hamming(0, 2) <= 8
    assert hamming(0, 3) > 16


def test_embedding_neardup(spark):
    rng = np.random.default_rng(7)
    v = rng.standard_normal(16)
    rows = [
        (0, [float(x) for x in v]),
        (1, [float(x) for x in (v + 0.01 * rng.standard_normal(16))]),  # near dup
        (2, [float(x) for x in rng.standard_normal(16)]),  # unrelated
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {(r["id_a"], r["id_b"]) for r in D.embedding_neardup_pairs(df, threshold=0.95).collect()}
    assert pairs == {(0, 1)}


def test_brute_force_topk_and_lsh_recall(spark):
    rng = np.random.default_rng(42)
    mat = rng.standard_normal((300, 64))
    mat[7] = mat[3] + 0.01 * rng.standard_normal(64)  # planted neighbor pair
    rows = [(i, [float(x) for x in mat[i]]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    bf = S.top1_neighbor(df, max_queries=20)
    got = {r["q_id"]: r["nn_id"] for r in bf.collect()}
    assert got[3] == 7  # planted pair is each other's top-1
    assert len(got) == 20

    # LSH path: planted near-identical pair lands in the same bucket and
    # survives the re-rank; recall over random vectors is approximate by
    # design, so only the planted pair is asserted
    lsh = S.lsh_bucket_topk(df, k=1, n_planes=8, dim=64)
    lsh_nn = {r["q_id"]: r["c_id"] for r in lsh.collect()}
    assert lsh_nn.get(3) == 7 and lsh_nn.get(7) == 3


def test_cluster_dedup_keep(spark):
    pairs = spark.createDataFrame([(0, 1), (0, 4), (2, 5)], "id_a long, id_b long")
    ids = spark.createDataFrame([(i,) for i in range(6)], "id long")
    kept = sorted(r["id"] for r in D.cluster_dedup_keep(pairs, ids).collect())
    assert kept == [0, 2, 3]


def test_quality_and_langid(spark):
    df = spark.createDataFrame(
        [(0, "the cat is on the mat, happily!"), (1, "le chat est dans la maison"), (2, "xyzzy")],
        "doc_id long, text string",
    )
    q = {r["doc_id"]: r for r in TS.quality_score(df).collect()}
    assert q[0]["n_tokens"] == 7
    assert q[0]["n_punct"] == 2  # comma + exclamation
    lang = {r["doc_id"]: r["lang_guess"] for r in TS.language_id(df).collect()}
    assert lang[0] == "en" and lang[1] == "fr" and lang[2] == "und"


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(0, "Hello   World"), (1, "  hello world "), (2, "hello worlds")],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: r["fingerprint"] for r in TS.fingerprint(df).collect()}
    assert fp[0] == fp[1]
    assert fp[0] != fp[2]


def test_multimodal_decode_plumbing(spark):
    docs = spark.createDataFrame(
        [(i, "x" * (10 + i), "en", f"src{i}", 10 + i) for i in range(9)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    assets = M.build_assets(docs)
    assert dict(assets.dtypes)["payload"] == "binary"
    decoded = M.decode_assets(assets)
    rows = {r["asset_id"]: r for r in decoded.collect()}
    assert len(rows) == 9
    for i, r in rows.items():
        assert r["byte_len"] == 10 + i
        assert r["ok"]
        if r["kind"] == "audio":
            assert r["n_frames"] == 0
        if r["kind"] == "image":
            assert r["n_frames"] == 1
    samples = M.frame_sample(decoded, every_n=2).collect()
    vids = [r for r in rows.values() if r["kind"] == "video"]
    expected = sum(len(range(0, r["n_frames"], 2)) for r in vids)
    assert len(samples) == expected


def test_decode_real_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        M._decode_real(b"bytes", "image")


def test_pipeline_aggregates_vs_duckdb(spark, transcripts, tmp_path):
    """Independent DuckDB re-implementation of parse→unwind→route→aggregate
    compared against the Spark pipeline output — the strongest whole
    -pipeline oracle (complements the driver's per-operator checks)."""
    from oplog_analyzer_spark.operators.filters import exclude_system_namespaces
    from oplog_analyzer_spark.operators.parse import parse_transcripts, unwind_applyops
    from oplog_analyzer_spark.sources.sinks import per_sink_aggregates, route_categories
    from oplog_analyzer_spark.transcripts import tool_catalog

    src = str(tmp_path / "t.parquet")
    transcripts.write.mode("overwrite").parquet(src)
    inp = spark.read.parquet(src)
    cat = tool_catalog(spark)
    got = (
        per_sink_aggregates(
            route_categories(
                unwind_applyops(exclude_system_namespaces(parse_transcripts(inp))), cat
            )
        )
        .orderBy("category", "ns")
        .toPandas()
    )

    con = duckdb.connect()
    con.register("cat", cat.toPandas())
    sql = rf"""
WITH parsed AS (
  SELECT conv_id, turn_idx, tool, ts,
         regexp_extract(text, 'ns=([a-zA-Z0-9_.$]+)', 1) AS ns,
         regexp_extract(text, 'op:([iudcn])', 1) AS op,
         CAST(strlen(text) AS BIGINT) AS size,
         regexp_extract(text, 'sub:(\S+)', 1) AS sub
  FROM read_parquet('{src}/*.parquet')
), filtered AS (
  SELECT * FROM parsed WHERE ns NOT LIKE 'config.%'
), unwound AS (
  SELECT conv_id, turn_idx, tool, ts, ns, op, size
  FROM filtered WHERE NOT (op = 'c' AND sub <> '')
  UNION ALL
  SELECT conv_id, turn_idx, tool, ts,
         string_split(u.s, '/')[1] AS ns,
         string_split(u.s, '/')[2] AS op,
         CAST(floor(size / len(string_split(sub, ';'))) AS BIGINT) AS size
  FROM filtered, unnest(string_split(sub, ';')) AS u(s)
  WHERE op = 'c' AND sub <> ''
), routed AS (
  SELECT w.*, coalesce(c.category, 'uncat') AS category
  FROM unwound w LEFT JOIN cat c ON w.tool = c.tool
)
SELECT category, ns, count(*) AS op_count,
       sum(CASE WHEN op='i' THEN 1 ELSE 0 END) AS n_insert,
       sum(CASE WHEN op='u' THEN 1 ELSE 0 END) AS n_update,
       sum(CASE WHEN op='d' THEN 1 ELSE 0 END) AS n_delete,
       sum(CASE WHEN op='c' THEN 1 ELSE 0 END) AS n_command,
       count(DISTINCT conv_id) AS distinct_conv,
       min(ts) AS min_ts, max(ts) AS max_ts, sum(size) AS total_bytes
FROM routed GROUP BY category, ns ORDER BY category, ns
"""
    want = con.execute(sql).df()
    assert len(got) == len(want)
    for col in ("category", "ns"):
        assert got[col].astype(str).tolist() == want[col].astype(str).tolist(), col
    for col in ("op_count", "n_insert", "n_update", "n_delete", "n_command",
                "distinct_conv", "total_bytes"):
        # duckdb sums come back as HUGEINT → float64 in pandas; compare as int
        assert got[col].astype("int64").tolist() == want[col].astype("int64").tolist(), col


def test_simhash_scale_blocking_equivalent(spark):
    """The 10^9-doc blocking config (8 blocks, match 5 → 40-bit keys) must
    return exactly the verified pairs of the default config: wider keys
    shed candidates, never true pairs (pigeonhole guarantee)."""
    base = " ".join(
        [
            "the quick brown fox jumps over the lazy dog near the old river bank",
            "and the wind moves slowly across the quiet green valley floor",
            "while distant birds call from tall pine trees beyond the ridge",
            "as evening light settles gently over the small sleeping town",
        ]
    )
    rows = [
        (0, base),
        (1, base),
        (2, base.replace("lazy", "sleepy")),
        (3, "completely different text about spark shuffle partitions and joins"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    default = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in D.simhash_pairs(df, max_hamming=3).collect()
    }
    scale = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in D.simhash_pairs(df, max_hamming=3, blocks=8, match_blocks=5).collect()
    }
    assert scale == default
    with pytest.raises(ValueError, match="pigeonhole"):
        D.simhash_pairs(df, max_hamming=3, blocks=4, match_blocks=2)


def test_ngram_doc_freq_cap_sheds_only_hot_shingles(docs):
    """max_doc_freq drops stop-shingles from the index: results are a
    subset of the exact pairs (no false positives), and pairs whose overlap
    is NOT hot-shingle-dominated survive."""
    exact = {
        (r["id_a"], r["id_b"])
        for r in D.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    capped_rows = D.ngram_jaccard_pairs(docs, threshold=0.5, max_doc_freq=3).collect()
    capped = {(r["id_a"], r["id_b"]) for r in capped_rows}
    assert capped <= exact
    # with a generous cap nothing is hot → identical results
    loose = {
        (r["id_a"], r["id_b"])
        for r in D.ngram_jaccard_pairs(docs, threshold=0.5, max_doc_freq=100).collect()
    }
    assert loose == exact


def test_ngram_default_is_finite_cap(docs):
    """The DEFAULT max_doc_freq must be a finite cap (VERDICT r05: the
    uncapped d²/2 form is the scale killer; None is the explicit opt-in),
    and below the cap the default equals the uncapped-exact results."""
    import inspect

    sig = inspect.signature(D.ngram_jaccard_pairs)
    assert sig.parameters["max_doc_freq"].default == 10_000
    default_pairs = {
        (r["id_a"], r["id_b"])
        for r in D.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in D.ngram_jaccard_pairs(docs, threshold=0.5, max_doc_freq=None).collect()
    }
    assert default_pairs == uncapped  # no shingle reaches 10k docs here


def test_lsh_multitable_multiprobe_improves_recall(spark):
    """Recall@1 vs brute force must improve (or at worst tie) when adding
    tables and hamming-1 probes — the levers against the single-table
    recall cliff."""
    # clustered corpus — the regime ANN serves (near-dup/similar documents
    # have high cosine); pure random gaussians have ~60° top-1 angles and
    # defeat any hyperplane-LSH configuration by construction
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((80, 64))
    mat = np.vstack([c + 0.15 * rng.standard_normal((5, 64)) for c in centers])
    rows = [(i, [float(x) for x in mat[i]]) for i in range(len(mat))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    truth = {
        r["q_id"]: r["nn_id"] for r in S.top1_neighbor(df, max_queries=60).collect()
    }

    def recall(**kw):
        got = {
            r["q_id"]: r["c_id"]
            for r in S.lsh_bucket_topk(df, k=1, n_planes=10, dim=64, **kw).collect()
        }
        hits = sum(1 for q, nn in truth.items() if got.get(q) == nn)
        return hits / len(truth)

    r1 = recall(n_tables=1)
    r4p = recall(n_tables=4, multiprobe=True)
    assert r4p >= r1
    assert r4p >= 0.8  # 4 tables x 11 probes recover intra-cluster top-1s


def test_ivf_topk_recall_and_determinism(spark):
    """IVF path: clustered corpus — intra-cluster top-1s live inside the
    probed inverted lists, so recall@1 vs brute force is high; results are
    deterministic (hash-seeded centroids, tie-broken ranks)."""
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((40, 64))
    mat = np.vstack([c + 0.12 * rng.standard_normal((6, 64)) for c in centers])
    rows = [(i, [float(x) for x in mat[i]]) for i in range(len(mat))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    truth = {
        r["q_id"]: r["nn_id"] for r in S.top1_neighbor(df, max_queries=60).collect()
    }
    a = S.ivf_topk(df, k=1, n_centroids=16, nprobe=3)
    b = S.ivf_topk(df, k=1, n_centroids=16, nprobe=3)
    ra = sorted(map(tuple, a.collect()))
    assert ra == sorted(map(tuple, b.collect()))
    got = {q: c for q, c, *_ in ra}
    hits = sum(1 for q, nn in truth.items() if got.get(q) == nn)
    assert hits / len(truth) >= 0.8
    # nprobe=total centroids degenerates to exact: recall 1.0 on queries
    full = {
        r["q_id"]: r["c_id"]
        for r in S.ivf_topk(df, k=1, n_centroids=16, nprobe=16).collect()
    }
    assert all(full[q] == nn for q, nn in truth.items())


def test_embedding_neardup_lsh_scale_path(spark):
    """The LSH-bucketed embedding near-dup path (the scale form the
    brute-force baseline quarantines itself behind): ZERO false positives
    by construction (exact cosine recheck — returned pairs carry the
    brute-force values verbatim), ≥0.9 recall of true near-dup pairs on a
    clustered corpus, deterministic, and max_bucket bounds an
    identical-embedding flood."""
    rng = np.random.default_rng(5)
    centers = rng.standard_normal((30, 64))
    rows, vid = [], 0
    for c in centers:  # 3 tight near-dups per center
        for _ in range(3):
            v = c + 0.03 * rng.standard_normal(64)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    for _ in range(40):  # background points, near-dup only by accident
        rows.append((vid, [float(x) for x in rng.standard_normal(64)]))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    brute = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in D.embedding_neardup_pairs(df, threshold=0.9).collect()
    }
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in D.embedding_neardup_lsh(
            df, threshold=0.9, n_tables=4, multiprobe=True
        ).collect()
    }
    assert set(got) <= set(brute)  # no false positives, ever
    assert brute and len(got) / len(brute) >= 0.9  # recall on clusters
    for k, v in got.items():
        assert brute[k] == v  # exact recheck carries brute-force cosines
    again = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in D.embedding_neardup_lsh(
            df, threshold=0.9, n_tables=4, multiprobe=True
        ).collect()
    }
    assert again == got  # deterministic

    # identical-embedding flood: d clones pair quadratically; the cap
    # bounds the candidate join
    flood = spark.createDataFrame(
        [(i, [1.0] * 64) for i in range(40)], "vec_id long, embedding array<double>"
    )
    uncapped = D.embedding_neardup_lsh(flood, threshold=0.9, multiprobe=False).count()
    capped = D.embedding_neardup_lsh(
        flood, threshold=0.9, multiprobe=False, max_bucket=5
    ).count()
    assert uncapped == 40 * 39 // 2
    assert capped <= 5 * 4 // 2


def test_emb_top1_nn_row_pins_ivf_recall_floor(spark):
    """The emb_top1_nn driver row carries the IVF recall certification
    (VERDICT r05 next-round #6): on the driver's sf0.01 corpus —
    near-uniform random embeddings, the worst case for partition-based ANN
    — the published ivf_topk answers under _ANN_IVF_CONF must reach the
    documented floor, and ivf_hit must be exactly the cosine-based hit
    indicator the oracle recomputes (sentinel misses score 0, never
    NULL)."""
    import shutil

    from oplog_analyzer_spark.entry_queries import (
        _ANN_RUN_ROOT,
        _ANN_VERSION,
        emb_top1_nn,
    )
    from tests.conftest import SF_ORACLE

    shutil.rmtree(
        f"{_ANN_RUN_ROOT}/sf0.01_{_ANN_VERSION}", ignore_errors=True
    )  # force a fresh publish so the floor tests THIS code, not a stale run
    rows = emb_top1_nn(spark, SF_ORACLE).collect()
    assert len(rows) == 100
    hits = sum(r["ivf_hit"] for r in rows)
    assert hits >= 70  # measured 76/100 at n_centroids=16, nprobe=8 (deterministic)
    for r in rows:
        assert r["ivf_hit"] == int(r["ivf_cosine"] >= r["cosine"])


def test_ivf_refinement_improves_recall(spark):
    """Lloyd refinement (refine_iters) tightens the coarse quantizer: on
    a clustered corpus, recall@1 at fixed nprobe must improve or tie vs
    the hash-seeded centroids, and never regress below a useful floor."""
    rng = np.random.default_rng(23)
    centers = rng.standard_normal((25, 64))
    mat = np.vstack([c + 0.1 * rng.standard_normal((8, 64)) for c in centers])
    rows = [(i, [float(x) for x in mat[i]]) for i in range(len(mat))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    truth = {
        r["q_id"]: r["cosine"]
        for r in S.top1_neighbor(df, max_queries=80).collect()
    }

    def recall(refine_iters: int) -> float:
        got = {
            r["q_id"]: r["cosine"]
            for r in S.ivf_topk(
                df, k=1, n_centroids=20, nprobe=2, refine_iters=refine_iters
            ).collect()
            if r["q_id"] in truth
        }
        return sum(
            1 for q, c in truth.items() if got.get(q) == c
        ) / len(truth)

    r0, r2 = recall(0), recall(2)
    assert r2 >= r0
    assert r2 >= 0.8


def test_ivf_max_bucket_caps_hot_list(spark):
    base = [1.0] + [0.0] * 63
    rows = [(i, base) for i in range(50)] + [
        (100 + i, [float(x) for x in np.random.default_rng(i).standard_normal(64)])
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    capped = S.ivf_topk(df, k=3, n_centroids=8, nprobe=2, max_bucket=10)
    per_q = capped.groupBy("q_id").count().agg(F.max("count")).collect()[0][0]
    assert per_q <= 10  # bounded by the capped list size


def test_ivf_plan_size_constant_in_n_centroids(spark):
    """The scale criterion from VERDICT r03 #2: at production-shaped
    n_centroids (1024 here, tens of thousands in a 10^9-vector deployment)
    the centroid matrix must ride in the pandas-UDF closure, NOT in the
    Catalyst plan — plan construction stays bounded and centroid
    assignment is a single ArrowEvalPython stage, never an interpreted
    ~10^5-literal expression tree."""
    import time

    rng = np.random.default_rng(7)
    rows = [
        (i, [float(x) for x in rng.standard_normal(64)]) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    t0 = time.time()
    out = S.ivf_topk(df, k=1, n_centroids=1024, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    build_wall = time.time() - t0
    # literal-embedded centroids took minutes to even optimize at this K;
    # the closure form plans in seconds (includes the bounded centroid
    # collect) and the plan text stays small
    assert build_wall < 60.0
    assert "ArrowEvalPython" in plan
    assert len(plan) < 200_000
    assert out.count() > 0  # and it executes


def test_multimodal_resize_and_features(spark, docs):
    """Resize: exact aspect-preserving integer target dims, payload passes
    through the stubbed codec seam; features: deterministic unit-norm
    array<float> joinable into the similarity operators."""
    from oplog_analyzer_spark.functions.similarity import brute_force_topk

    assets = M.build_assets(
        docs.withColumn("source", F.lit("t")).withColumn(
            "n_chars", F.octet_length("text")
        )
    )
    resized = M.resize_assets(assets, max_side=100).collect()
    for r in resized:
        w, h, ow, oh = r["width"], r["height"], r["out_width"], r["out_height"]
        if max(w, h) <= 100:
            assert (ow, oh) == (w, h) and not r["resized"]
        else:
            assert max(ow, oh) <= 100 and r["resized"]
            # floor-scaled exact dims
            assert ow == max(1, w * 100 // max(w, h))
            assert oh == max(1, h * 100 // max(w, h))

    feats = M.extract_features(assets, dim=8)
    p = feats.toPandas().set_index("asset_id")["embedding"]
    again = M.extract_features(assets, dim=8).toPandas().set_index("asset_id")["embedding"]
    assert all(list(p[i]) == list(again[i]) for i in p.index)  # deterministic
    for v in p:
        assert abs(sum(x * x for x in v) - 1.0) < 1e-3  # unit norm
    # bridge into similarity ops: features behave as an embedding column
    fdf = feats.withColumnRenamed("asset_id", "vec_id")
    out = brute_force_topk(fdf, fdf, k=1)
    assert out.count() == len(p)


def test_lsh_max_bucket_caps_candidates_deterministically(spark):
    """A degenerate hot bucket (identical vectors) must be capped: bounded
    candidate count, deterministic results across runs."""
    base = [1.0] + [0.0] * 63
    rows = [(i, base) for i in range(50)] + [
        (100 + i, [float(x) for x in np.random.default_rng(i).standard_normal(64)])
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    capped1 = S.lsh_bucket_topk(df, k=3, n_planes=8, dim=64, max_bucket=10)
    capped2 = S.lsh_bucket_topk(df, k=3, n_planes=8, dim=64, max_bucket=10)
    a = sorted(map(tuple, capped1.collect()))
    assert a == sorted(map(tuple, capped2.collect()))
    # hot-bucket queries see at most max_bucket-1 candidates (minus self)
    per_q = capped1.groupBy("q_id").count().agg(F.max("count")).collect()[0][0]
    assert per_q <= 10


# --- deterministic sampling / dataset-split primitives -------------------

def _split_df(spark, n=20000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("lang"),
    )


def test_hash_split_invariants(spark):
    """Train/val/test assignment must be a pure function of (id, seed):
    deterministic, partition/order-invariant, disjoint-and-complete,
    within tolerance of the weights, and STABLE when the corpus grows
    (a row never migrates between splits on re-runs — eval contamination
    guard)."""
    from oplog_analyzer_spark.functions import sampling as SP

    df = _split_df(spark)
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["doc_id"]: r["split"] for r in SP.hash_split(df, weights=w).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in SP.hash_split(
            df.repartition(13).orderBy(F.desc("doc_id")), weights=w
        ).collect()
    }
    assert a == b  # deterministic + partition/order invariant
    assert len(a) == 20000 and set(a.values()) == {"train", "val", "test"}
    counts = {s: sum(1 for v in a.values() if v == s) for s in w}
    for name, frac in w.items():
        assert abs(counts[name] / 20000 - frac) < 0.02, (name, counts)
    # growth stability: the first 5000 ids keep their labels in a 4x corpus
    small = {
        r["doc_id"]: r["split"]
        for r in SP.hash_split(_split_df(spark, 5000), weights=w).collect()
    }
    assert all(a[k] == v for k, v in small.items())
    # weights must be validated
    import pytest as _pytest

    with _pytest.raises(ValueError):
        SP.hash_split(df, weights={"a": 0.9, "b": 0.2})


def test_null_ids_hash_to_null_matching_sql_twin(spark):
    """functions/hashing.py NULL contract: a NULL id hashes to NULL in
    BOTH hash families (the SQL twin's 'seed:' || NULL is NULL) — so it
    takes the fall-through split label and drops out of hash-threshold
    filters, identically in Spark and the md5-mode DuckDB oracle.  A
    concat_ws-built hash would instead collapse every NULL id into one
    md5('<seed>:') bucket no SQL oracle reproduces."""
    from oplog_analyzer_spark.functions import sampling as SP

    df = spark.createDataFrame(
        [(None, "en"), ("d1", "en"), ("d2", "de")], "doc_id string, lang string"
    )
    for hash_fn in ("xxhash64", "md5"):
        split = {
            r["doc_id"]: r["split"]
            for r in SP.hash_split(
                df, weights={"train": 0.5, "val": 0.5}, hash_fn=hash_fn
            ).collect()
        }
        assert split[None] == "val"  # CASE fall-through, as in SQL
        kept = SP.stratified_sample_fraction(
            df, ["lang"], 1.0, hash_fn=hash_fn
        ).collect()
        assert {r["doc_id"] for r in kept} == {"d1", "d2"}  # NULL < t is NULL
    # the md5 form must agree with DuckDB row-by-row, NULL included
    import pandas as pd

    con = duckdb.connect()
    con.register("t", pd.DataFrame({"doc_id": [None, "d1", "d2"]}))
    oracle = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT doc_id, CASE WHEN {SP.md5_bucket_sql('doc_id')} < 500000 "
            "THEN 'train' ELSE 'val' END FROM t"
        ).fetchall()
    }
    got = {
        r["doc_id"]: r["split"]
        for r in SP.hash_split(
            df.select("doc_id"), weights={"train": 0.5, "val": 0.5}, hash_fn="md5"
        ).collect()
    }
    assert got == oracle


def test_stratified_fraction_nested_and_per_stratum(spark):
    """Hash-threshold sampling: kept(0.1) ⊆ kept(0.3) (nested samples),
    per-stratum fraction map honored, unlisted strata dropped, all
    shuffle-free."""
    from oplog_analyzer_spark.functions import sampling as SP

    df = _split_df(spark)
    k1 = {r["doc_id"] for r in SP.stratified_sample_fraction(df, ["lang"], 0.1).collect()}
    k3 = {r["doc_id"] for r in SP.stratified_sample_fraction(df, ["lang"], 0.3).collect()}
    assert k1 <= k3  # raising the rate only ADDS rows
    assert abs(len(k3) / 20000 - 0.3) < 0.02
    per = SP.stratified_sample_fraction(df, ["lang"], {"0": 0.5, "1": 0.05})
    got = per.groupBy("lang").count().collect()
    by = {r["lang"]: r["count"] for r in got}
    assert set(by) == {"0", "1"}  # stratum "2" unlisted → dropped
    assert abs(by["0"] / 6667 - 0.5) < 0.05 and abs(by["1"] / 6667 - 0.05) < 0.03
    # shuffle-free plan: no Exchange in the fraction form
    plan = SP.stratified_sample_fraction(df, ["lang"], 0.1)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan


def test_stratified_quota_exact_and_deterministic(spark):
    from oplog_analyzer_spark.functions import sampling as SP

    df = _split_df(spark, 300)  # 100 per stratum
    q = SP.stratified_sample_quota(df, ["lang"], 40)
    counts = {r["lang"]: r["count"] for r in q.groupBy("lang").count().collect()}
    assert counts == {"0": 40, "1": 40, "2": 40}
    again = SP.stratified_sample_quota(df.repartition(7), ["lang"], 40)
    assert sorted(map(tuple, q.collect())) == sorted(map(tuple, again.collect()))
    # quota above stratum size degrades to the whole stratum
    assert SP.stratified_sample_quota(df, ["lang"], 1000).count() == 300


def test_pack_sequences_invariants(spark):
    """Bucketed greedy packing: every doc packed exactly once, no sequence
    exceeds max_tokens (unless a single oversize doc owns it), assignment
    deterministic and invariant to physical partitioning, oversize flagged,
    and a Python reference greedy reproduces each bucket's assignment."""
    from oplog_analyzer_spark.functions import packing as P

    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 37 + 11, F.lit(900)) + 1).cast("int").alias("n_tokens"),
    )
    packed = P.pack_sequences(df, max_tokens=1000, n_buckets=8).cache()
    rows = packed.collect()
    assert len(rows) == 500 and len({r["doc_id"] for r in rows}) == 500  # complete
    stats = P.sequence_stats(packed).collect()
    for s in stats:
        assert s["total_tokens"] <= 1000 or (s["n_docs"] == 1 and s["has_oversize"])
    # determinism + partition invariance
    again = P.pack_sequences(
        df.repartition(17).orderBy(F.desc("doc_id")), max_tokens=1000, n_buckets=8
    )
    key = lambda r: (r["doc_id"], r["bucket"], r["seq_idx"])
    assert sorted(map(key, rows)) == sorted(map(key, again.collect()))
    # fill efficiency: mean fill of non-final sequences well above half --
    # greedy can't leave two consecutive sequences both under half full
    fills = [s["total_tokens"] for s in stats]
    assert sum(fills) / (len(fills) * 1000) > 0.5
    # python reference greedy per bucket reproduces seq_idx exactly
    import collections
    by_bucket = collections.defaultdict(list)
    hashes = {
        r["doc_id"]: r["h"]
        for r in df.select(
            "doc_id", F.xxhash64(F.lit(42), "doc_id").alias("h")
        ).collect()
    }
    toks = {r["doc_id"]: r["n_tokens"] for r in df.collect()}
    for r in rows:
        by_bucket[r["bucket"]].append(r["doc_id"])
    got = {r["doc_id"]: r["seq_idx"] for r in rows}
    for b, ids in by_bucket.items():
        ids.sort(key=lambda d: (hashes[d], d))
        cur, fill = 0, 0
        for d in ids:
            t = toks[d]
            if fill > 0 and fill + t > 1000:
                cur, fill = cur + 1, 0
            assert got[d] == cur, (b, d)
            fill += t


def test_pack_sequences_oversize_doc_gets_own_sequence(spark):
    from oplog_analyzer_spark.functions import packing as P

    df = spark.createDataFrame(
        [(1, 50), (2, 5000), (3, 60)], "doc_id long, n_tokens int"
    )
    packed = P.pack_sequences(df, max_tokens=100, n_buckets=1).collect()
    big = next(r for r in packed if r["doc_id"] == 2)
    assert big["oversize"]
    others = [r["seq_idx"] for r in packed if r["doc_id"] != 2]
    assert big["seq_idx"] not in others  # oversize doc shares with nobody


def test_pack_sequences_md5_mode_same_logic(spark):
    """hash_fn='md5' changes ONLY the bucket/order key, not the greedy
    logic: a Python reference greedy walking md5-hash order reproduces
    every (bucket, seq_idx) slot — the same parity the driver row
    packing_md5_greedy certifies via a recursive-CTE SQL oracle."""
    from oplog_analyzer_spark.functions import packing as P

    df = spark.range(300).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 53 + 7, F.lit(140)) + 10).cast("int").alias("n_tokens"),
    )
    packed = P.pack_sequences(
        df, max_tokens=120, n_buckets=4, seed=5, hash_fn="md5"
    ).collect()
    assert len(packed) == 300
    import collections
    import hashlib

    def h(d):
        return int(hashlib.md5(f"5:{d}".encode()).hexdigest()[:8], 16)

    by_bucket = collections.defaultdict(list)
    for r in packed:
        assert r["bucket"] == h(r["doc_id"]) % 4
        by_bucket[r["bucket"]].append(r["doc_id"])
    toks = {r["doc_id"]: r["n_tokens"] for r in df.collect()}
    got = {r["doc_id"]: r["seq_idx"] for r in packed}
    for b, ids in by_bucket.items():
        ids.sort(key=lambda d: (h(d), d))
        cur, fill = 0, 0
        for d in ids:
            t = toks[d]
            if fill > 0 and fill + t > 120:
                cur, fill = cur + 1, 0
            assert got[d] == cur, (b, d)
            fill += t


def test_shuffle_deterministic_orders(spark):
    from oplog_analyzer_spark.functions import packing as P

    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    a = [r["doc_id"] for r in P.shuffle_deterministic(df).collect()]
    b = [r["doc_id"] for r in P.shuffle_deterministic(df.repartition(9)).collect()]
    assert a == b                 # reproducible epoch order
    assert a != sorted(a)         # actually shuffled
    c = [r["doc_id"] for r in P.shuffle_deterministic(df, seed=43).collect()]
    assert a != c                 # new seed → new epoch order


def test_stratified_fraction_large_map_broadcast_path(spark):
    """Maps beyond 64 strata switch from an OR-chain to a broadcast join
    against a VALUES-literal threshold dim: same semantics and SAME output
    schema/column order as the small-map path (the ADVICE-r03 routed() bug
    class), plan O(1) in map size."""
    from oplog_analyzer_spark.functions import sampling as SP

    df = spark.range(10000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 100).cast("string").alias("lang"),
        (F.col("id") * 2).alias("extra"),
    )
    big = {str(i): (0.5 if i < 50 else 0.05) for i in range(100)}  # 100 strata
    out = SP.stratified_sample_fraction(df, ["lang"], big)
    assert out.columns == df.columns  # order not path-dependent
    rows = out.collect()
    lo = sum(1 for r in rows if int(r["lang"]) < 50)
    hi = len(rows) - lo
    assert abs(lo / 5000 - 0.5) < 0.05 and abs(hi / 5000 - 0.05) < 0.03
    # small-map path agrees exactly on a stratum present in both
    small = SP.stratified_sample_fraction(df, ["lang"], {"7": 0.5})
    assert {r["doc_id"] for r in small.collect()} == {
        r["doc_id"] for r in rows if r["lang"] == "7"
    }
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_pack_sequences_single_shuffle(spark):
    """The packing plan's only exchange is the bucket repartition — the
    100 TB cost model (one shuffle + per-bucket Arrow scan) is the plan
    that actually compiles, not just the docstring."""
    from oplog_analyzer_spark.functions import packing as P

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 500 + 1).cast("int").alias("n_tokens")
    )
    plan = P.pack_sequences(df, max_tokens=512, n_buckets=8)._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "FlatMapGroupsInPandas" in plan


def test_stratified_quota_prefilter_equals_exact(spark):
    """The scale path (hash-prefix prefilter before the ranked window)
    must select the IDENTICAL rows as the exact single-window form — the
    prefilter cuts a prefix of the same rank order.  Fixture: one 1000-row
    stratum with safety*n = 80 expected survivors (the p<1 branch) and one
    30-row stratum (the p=1 bypass)."""
    from oplog_analyzer_spark.functions import sampling as SP

    df = spark.range(1030).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 1000, "big").otherwise("small").alias("lang"),
    )
    exact = SP.stratified_sample_quota(df, ["lang"], 10)
    fast = SP.stratified_sample_quota(df, ["lang"], 10, prefilter_safety=8.0)
    assert sorted(map(tuple, exact.collect())) == sorted(map(tuple, fast.collect()))
    counts = {r["lang"]: r["count"] for r in fast.groupBy("lang").count().collect()}
    assert counts == {"big": 10, "small": 10}


def test_pack_sequences_auto_bucket_sizing(spark):
    """Defaulted n_buckets must derive from the row count so no
    applyInPandas group (materialized whole on one executor) exceeds the
    target; an explicit n_buckets that implies >4x the target per bucket
    is the executor-OOM configuration and must be rejected loudly."""
    import pytest as _pytest

    from oplog_analyzer_spark.functions import packing as P

    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 90 + 1).cast("int").alias("n_tokens"),
    )
    packed = P.pack_sequences(df, max_tokens=256, target_rows_per_bucket=50)
    rows = packed.collect()
    assert len(rows) == 500  # complete under auto sizing
    n_b = len({r["bucket"] for r in rows})
    assert n_b == 10  # ceil(500 / 50) > defaultParallelism (4 in tests)
    # the derived count floors at defaultParallelism (ADVICE r05): a small
    # input must not collapse to ONE serial applyInPandas task
    tiny = P.pack_sequences(df, max_tokens=256, target_rows_per_bucket=1_000_000)
    dp = spark.sparkContext.defaultParallelism
    tiny_buckets = {r["bucket"] for r in tiny.collect()}
    assert len(tiny_buckets) > 1 and max(tiny_buckets) < dp
    # explicit n_buckets past the bound → refuse (500 rows / 1 bucket
    # = 500 > 4 * 50)
    with _pytest.raises(ValueError, match="n_buckets"):
        P.pack_sequences(df, max_tokens=256, n_buckets=1, target_rows_per_bucket=50)
    # ... unless the caller takes responsibility explicitly
    assert (
        P.pack_sequences(
            df, max_tokens=256, n_buckets=1, target_rows_per_bucket=50,
            check_explicit_buckets=False,
        ).count()
        == 500
    )


def test_sampling_md5_mode_matches_duckdb(spark):
    """hash_fn='md5' makes split/fraction/quota byte-reproducible by an
    external SQL engine: DuckDB computing the same md5-bucket expression
    selects the IDENTICAL rows and labels."""
    from oplog_analyzer_spark.functions import sampling as SP

    df = spark.range(2000).select(F.col("id").alias("doc_id"),
                                  (F.col("id") % 3).cast("string").alias("lang"))
    bucket_sql = SP.md5_bucket_sql("doc_id")
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT i AS doc_id, CAST(i % 3 AS VARCHAR) "
                "AS lang FROM range(2000) r(i)")
    # split
    got = {r["doc_id"]: r["split"]
           for r in SP.hash_split(df, weights={"train": 0.8, "val": 0.1,
                                               "test": 0.1},
                                  hash_fn="md5").collect()}
    exp = dict(con.execute(
        f"SELECT doc_id, CASE WHEN {bucket_sql} < 800000 THEN 'train' "
        f"WHEN {bucket_sql} < 900000 THEN 'val' ELSE 'test' END FROM t"
    ).fetchall())
    assert got == exp
    # fraction
    kept = {r["doc_id"] for r in SP.stratified_sample_fraction(
        df, ["lang"], 0.25, hash_fn="md5").collect()}
    exp_kept = {r[0] for r in con.execute(
        f"SELECT doc_id FROM t WHERE {bucket_sql} < 250000").fetchall()}
    assert kept == exp_kept
    # quota
    q = {r["doc_id"] for r in SP.stratified_sample_quota(
        df, ["lang"], 17, hash_fn="md5").collect()}
    exp_q = {r[0] for r in con.execute(
        f"SELECT doc_id FROM (SELECT doc_id, row_number() OVER "
        f"(PARTITION BY lang ORDER BY {bucket_sql}, doc_id) AS rk FROM t) "
        f"WHERE rk <= 17").fetchall()}
    assert q == exp_q


def test_stratified_fraction_broadcast_path_guards(spark):
    """ADVICE r04: the >64-strata VALUES-literal path must reject
    non-finite float stratum values (repr(inf) is not SQL) and an input
    already carrying the reserved '__thresh' column."""
    import pytest as _pytest

    from oplog_analyzer_spark.functions import sampling as SP

    df = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 80).cast("double").alias("g")
    )
    big_map = {float(i): 0.5 for i in range(80)}
    bad_map = dict(big_map)
    bad_map[float("inf")] = 0.5
    with _pytest.raises(ValueError, match="non-finite"):
        SP.stratified_sample_fraction(df, ["g"], bad_map)
    with _pytest.raises(ValueError, match="__thresh"):
        SP.stratified_sample_fraction(
            df.withColumn("__thresh", F.lit(1)), ["g"], big_map
        )
    # the clean 80-stratum map still works (broadcast path)
    assert SP.stratified_sample_fraction(df, ["g"], big_map).count() > 0


# --- connected components / transitive cluster resolution (functions/graph) -


def _uf_components(n_ids, edges):
    """Pure-Python union-find reference: id -> min id of its component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _cc_spark(spark, edges):
    from oplog_analyzer_spark.functions import graph as G

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r["id"]: r["component"] for r in G.connected_components(df).collect()
    }


def test_connected_components_shapes(spark):
    """Chain, ring, two components, duplicate + reversed edges, self-loop:
    labels equal the union-find reference exactly (component = min id),
    and every NON-isolated node — representatives included — gets a row."""
    cases = [
        [(1, 2), (2, 3), (3, 4), (4, 5)],                  # chain
        [(1, 2), (2, 3), (3, 1)],                          # ring
        [(1, 2), (3, 4)],                                  # two comps
        [(1, 2), (2, 1), (1, 2), (7, 7)],                  # dup/rev/self
        [(10, 2), (2, 30), (30, 4), (5, 4), (100, 5)],     # zigzag ids
    ]
    for edges in cases:
        got = _cc_spark(spark, edges)
        want = _uf_components(None, [(a, b) for a, b in edges if a != b])
        assert got == want, edges


def test_connected_components_fuzz_vs_union_find(spark):
    """Seeded random graphs (the hypothesis-style fuzz, deterministic so CI
    is stable): 3 graphs x 120 nodes, edge density around the percolation
    threshold so both giant components and many singletons occur."""
    import random

    rng = random.Random(1234)
    for density in (0.4, 1.0, 2.5):
        n = 120
        m = int(n * density)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        got = _cc_spark(spark, edges)
        assert got == _uf_components(n, edges)


def test_connected_components_string_ids_and_empty(spark):
    from oplog_analyzer_spark.functions import graph as G

    df = spark.createDataFrame(
        [("conv_b", "conv_a"), ("conv_c", "conv_b")], "id_a string, id_b string"
    )
    got = {r["id"]: r["component"] for r in G.connected_components(df).collect()}
    assert got == {"conv_a": "conv_a", "conv_b": "conv_a", "conv_c": "conv_a"}

    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert G.connected_components(empty).count() == 0


def test_connected_components_star_input_zero_rounds(spark, monkeypatch):
    """An already-resolved edge list (min-rooted star forest) must be
    detected BEFORE the first round — the structural fixpoint test."""
    from oplog_analyzer_spark.functions import graph as G

    calls = []
    orig = G._large_star
    monkeypatch.setattr(
        G, "_large_star", lambda e: (calls.append(1), orig(e))[1]
    )
    df = spark.createDataFrame(
        [(5, 1), (7, 1), (9, 2)], "id_a long, id_b long"
    )
    # local_max_edges=0 forces the distributed loop (the r7 bounded driver
    # finish would otherwise resolve this tiny graph before the check)
    got = {
        r["id"]: r["component"]
        for r in G.connected_components(df, local_max_edges=0).collect()
    }
    assert got == {1: 1, 5: 1, 7: 1, 9: 2, 2: 2}
    assert calls == []


def test_connected_components_local_finish_equals_distributed(spark):
    """r7: the bounded driver union-find finish (default, fires when the
    canonical edge set fits local_max_edges) must label identically to the
    distributed star alternation on the same graphs — longs, strings, and
    an empty set; the cap probe must not disturb the distributed result."""
    import random

    from oplog_analyzer_spark.functions import graph as G

    rng = random.Random(99)
    n = 80
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    local = {
        r["id"]: r["component"] for r in G.connected_components(df).collect()
    }
    dist = {
        r["id"]: r["component"]
        for r in G.connected_components(df, local_max_edges=0).collect()
    }
    assert local == dist

    sdf = spark.createDataFrame(
        [("conv_b", "conv_a"), ("conv_c", "conv_b"), ("zz", "yy")],
        "id_a string, id_b string",
    )
    local_s = {
        r["id"]: r["component"] for r in G.connected_components(sdf).collect()
    }
    dist_s = {
        r["id"]: r["component"]
        for r in G.connected_components(sdf, local_max_edges=0).collect()
    }
    assert local_s == dist_s
    assert G.connected_components(sdf).schema == G.connected_components(
        sdf, local_max_edges=0
    ).schema or [
        (f.name, f.dataType)
        for f in G.connected_components(sdf).schema.fields
    ] == [
        (f.name, f.dataType)
        for f in G.connected_components(sdf, local_max_edges=0).schema.fields
    ]

    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert G.connected_components(empty).count() == 0


def test_dedup_clusters_and_size_stats(spark):
    from oplog_analyzer_spark.functions import graph as G

    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "id_a long, id_b long"
    )
    ids = spark.createDataFrame([(i,) for i in range(7)], "id long")
    clusters = G.dedup_clusters(pairs, ids)
    got = {r["id"]: r["cluster_id"] for r in clusters.collect()}
    # isolated docs 3 and 6 are their own cluster
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4, 6: 6}

    stats = {
        r["cluster_size"]: (r["n_clusters"], r["n_docs"])
        for r in G.cluster_size_stats(clusters).collect()
    }
    assert stats == {3: (1, 3), 2: (1, 2), 1: (2, 2)}


def test_cluster_dedup_keep_policies(spark):
    """The documented greedy-vs-component_min divergence cases:

    * chain 0-1, 1-2: greedy drops both 1 and 2 (each is some pair's
      b side); component_min keeps only the component min 0 — same here.
    * shared-neighbor 0-2, 1-2 (0 and 1 NOT near-dups): greedy keeps
      0 AND 1; component_min collapses the component to just 0.
    """
    ids = spark.createDataFrame([(i,) for i in range(3)], "id long")

    chain = spark.createDataFrame([(0, 1), (1, 2)], "id_a long, id_b long")
    assert sorted(
        r["id"] for r in D.cluster_dedup_keep(chain, ids, "greedy").collect()
    ) == [0]
    assert sorted(
        r["id"]
        for r in D.cluster_dedup_keep(chain, ids, "component_min").collect()
    ) == [0]

    shared = spark.createDataFrame([(0, 2), (1, 2)], "id_a long, id_b long")
    assert sorted(
        r["id"] for r in D.cluster_dedup_keep(shared, ids, "greedy").collect()
    ) == [0, 1]
    assert sorted(
        r["id"]
        for r in D.cluster_dedup_keep(shared, ids, "component_min").collect()
    ) == [0]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="policy"):
        D.cluster_dedup_keep(chain, ids, "nope")


def test_cluster_keep_best(spark):
    """Keep-best-per-cluster: highest score wins, ties break on smaller id,
    isolated docs always survive (they are their own cluster)."""
    from oplog_analyzer_spark.functions import graph as G

    pairs = spark.createDataFrame([(0, 1), (1, 2)], "id_a long, id_b long")
    ids = spark.createDataFrame([(i,) for i in range(4)], "id long")
    clusters = G.dedup_clusters(pairs, ids)
    scored = spark.createDataFrame(
        [(0, 10), (1, 99), (2, 99), (3, 1)], "id long, score long"
    )
    kept = {r["id"]: r["cluster_id"] for r in
            G.cluster_keep_best(clusters, scored).collect()}
    # cluster {0,1,2}: 1 and 2 tie at 99 -> smaller id 1 wins; isolated 3 kept
    assert kept == {1: 0, 3: 3}


# --- decontamination / repetition / PII (r6 training-data family) ----------


def test_contamination_report_and_decontaminate(spark):
    from oplog_analyzer_spark.functions import decontam as DC

    train = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon"),   # shares 'alpha beta gamma'
            (1, "zeta eta theta iota kappa"),        # clean
            (2, "x alpha beta gamma y"),             # shares the same trigram
            (3, "tiny doc"),                         # <n tokens, whole-text gram
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma"), (101, "tiny doc")],
        "doc_id long, text string",
    )
    rep = {
        r["doc_id"]: (r["hit_grams"], r["total_grams"])
        for r in DC.contamination_report(train, bench, n=3).collect()
    }
    # doc 0: grams {abg, bgd, gde} -> 1 hit of 3; doc 2: {xab, abg, bgy} -> 1/3
    # doc 3: whole-text fallback 'tiny doc' matches bench 101's fallback gram
    assert rep == {0: (1, 3), 2: (1, 3), 3: (1, 1)}

    kept = sorted(r["doc_id"] for r in DC.decontaminate(train, bench, n=3).collect())
    assert kept == [1]

    # min_hits=2 demands two shared grams: nothing reaches it here
    assert DC.contamination_report(train, bench, n=3, min_hits=2).count() == 0
    assert sorted(
        r["doc_id"] for r in DC.decontaminate(train, bench, n=3, min_hits=2).collect()
    ) == [0, 1, 2, 3]


def test_repetition_stats_exact_values(spark):
    df = spark.createDataFrame(
        [
            # 6 tokens, 3 distinct -> dup_token 5000; bigrams: 'a a','a a',
            # 'a b','b b','b a' -> top 'a a' 2/5 -> 4000
            (0, "a a a b b a"),
            # all distinct tokens and bigrams; single line
            (1, "one two three four"),
            # two identical lines of two tokens: dup_line 1/2 -> 5000
            (2, "x y\nx y"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["dup_token_frac_x10000"],
            r["dup_line_frac_x10000"],
            r["top_ngram_frac_x10000"],
        )
        for r in TS.repetition_stats(df, n=2).collect()
    }
    assert got[0] == (6, 6666, 0, 4000)
    assert got[1] == (4, 0, 0, 3333)  # 3 bigrams, top 1/3
    # 'x y\nx y': tokens [x, y\nx, y]? no — regex \s+ split eats the newline:
    # tokens [x,y,x,y] -> dup 5000; bigrams 'x y','y x','x y' -> 6666; and the
    # newline split sees two identical lines -> 5000
    assert got[2] == (4, 5000, 5000, 6666)


def test_repetition_ok_thresholds(spark):
    df = spark.createDataFrame(
        [
            (0, "spam spam spam spam spam"),       # dup-token rule fires
            (1, "a fresh sentence with variety"),  # short: ngram rule waived
            # 12 tokens, all distinct, but one bigram dominates 6/11 > 1800
            (2, "go stop go stop go stop one two three four five six"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["repetition_ok"] for r in TS.repetition_ok(df).collect()}
    assert got == {0: False, 1: True, 2: False}


def test_redact_pii_counts_and_chain_order(spark):
    df = spark.createDataFrame(
        [
            (0, "write bob@example.com or call 555-123-4567 from 10.0.0.1"),
            (1, "no pii here at all"),
            (2, "two mails a@b.io c@d.org and ip 192.168.0.255"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in TS.redact_pii(df).collect()}
    assert (rows[0]["n_emails"], rows[0]["n_ipv4"], rows[0]["n_phones"]) == (1, 1, 1)
    assert rows[0]["text_redacted"] == "write <EMAIL> or call <PHONE> from <IP>"
    assert (rows[1]["n_emails"], rows[1]["n_ipv4"], rows[1]["n_phones"]) == (0, 0, 0)
    assert rows[1]["text_redacted"] == "no pii here at all"
    assert (rows[2]["n_emails"], rows[2]["n_ipv4"], rows[2]["n_phones"]) == (2, 1, 0)
    assert rows[2]["text_redacted"] == "two mails <EMAIL> <EMAIL> and ip <IP>"


# --- domain mixture sampling (r6) -------------------------------------------


def test_domain_mixture_thresholds_exact_math():
    from oplog_analyzer_spark.functions.sampling import (
        _BUCKETS,
        domain_mixture_thresholds,
    )

    # binding domain = fewest tokens-per-share: b has 100 tokens for 1
    # share; a has 1000 for 2 shares (500/share) -> a thinned to 200 tokens
    thr = domain_mixture_thresholds({"a": 1000, "b": 100}, {"a": 2, "b": 1})
    assert thr["b"] == _BUCKETS                      # binding keeps all
    assert thr["a"] == _BUCKETS * 2 * 100 // (1 * 1000)  # = 200000 (20%)

    # e=d term caps every threshold at exactly _BUCKETS
    thr2 = domain_mixture_thresholds({"a": 7, "b": 7}, {"a": 1, "b": 1})
    assert thr2 == {"a": _BUCKETS, "b": _BUCKETS}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="no tokens"):
        domain_mixture_thresholds({"a": 10}, {"a": 1, "b": 1})
    with _pytest.raises(ValueError, match="positive ints"):
        domain_mixture_thresholds({"a": 10, "b": 10}, {"a": 0.5, "b": 1})


def test_domain_mixture_sample_share_and_determinism(spark):
    from oplog_analyzer_spark.functions import sampling as SP

    rows = [
        (i, " ".join(["tok"] * (10 + i % 5)), f"d{i % 3}") for i in range(600)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    weights = {"d0": 3, "d1": 1}  # d2 unlisted -> dropped entirely
    kept = SP.domain_mixture_sample(df, "source", weights, seed=9)
    pdf = kept.withColumn(
        "n", F.size(F.split(F.trim("text"), r"\s+"))
    ).groupBy("source").agg(F.sum("n").alias("toks")).toPandas()
    shares = dict(zip(pdf["source"], pdf["toks"]))
    assert set(shares) == {"d0", "d1"}
    # token ratio ~3:1 (hash sampling: expectation, generous tolerance)
    ratio = shares["d0"] / shares["d1"]
    assert 2.2 < ratio < 3.8, ratio

    # deterministic + partition-invariant: same kept ids on a reshuffle
    ids1 = sorted(r["doc_id"] for r in kept.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in SP.domain_mixture_sample(
            df.repartition(13), "source", weights, seed=9
        ).collect()
    )
    assert ids1 == ids2

    # pre-computed token column path agrees with the derived-tokens path
    from oplog_analyzer_spark.functions.textstats import token_count

    with_n = token_count(df)
    ids3 = sorted(
        r["doc_id"]
        for r in SP.domain_mixture_sample(
            with_n, "source", weights, token_col="n_tokens", seed=9
        ).collect()
    )
    assert ids1 == ids3


def test_bpe_token_count_vs_python_re(spark):
    """The Java-regex count must equal Python re.findall on the same
    pattern (both leftmost-first alternation) — including apostrophe
    contractions, punctuation runs, and digit runs that whitespace
    tokenization undercounts."""
    import re

    texts = [
        "don't stop-me now, it's 42.5 degrees!!  ok",
        "plain words only here",
        "a1b2c3 --- ...",
        "",
        "  leading and trailing  ",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in TS.bpe_token_count(df).collect()
    }
    want = {
        i: len(re.findall(TS.BPE_ISH_PATTERN, t)) for i, t in enumerate(texts)
    }
    assert got == want


def test_lsh_certified_config_recall_floor(spark):
    """The ann_lsh_recall driver row's exact configuration must clear a
    pinned recall floor on the near-uniform sf0.01 embeddings (the
    partition-hostile worst case) — 94/100 measured, floor 85 so host-
    independent plane math has headroom without masking a real regression."""
    from oplog_analyzer_spark.entry_queries import _ANN_LSH_CONF, load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    brute = S.top1_neighbor(emb, max_queries=100).select(
        "q_id", F.col("cosine").alias("bc")
    )
    lsh = S.lsh_bucket_topk(emb, **_ANN_LSH_CONF).filter(F.col("q_id") < 100)
    hits = (
        brute.join(lsh, "q_id", "left")
        .select(
            F.sum(F.when(F.col("cosine") >= F.col("bc"), 1).otherwise(0)).alias("h")
        )
        .collect()[0]["h"]
    )
    assert hits >= 85, hits


def test_minhash_numpy_family_equivalence(docs):
    """The r6 Arrow fast path ("numpy" family): exact duplicates are ALWAYS
    candidates (identical shingle sets -> identical signatures in any
    family), emitted pairs carry exact-jaccard inter/uni, and the result is
    deterministic and partition-invariant."""
    got = {
        (r["id_a"], r["id_b"]): (r["inter"], r["uni"])
        for r in D.minhash_lsh_pairs(docs, threshold=0.5, hash_fn="numpy").collect()
    }
    # 0/1 byte-identical, 0/4 and 1/4 whitespace/case variants: same shingle
    # sets, guaranteed candidates in every family
    assert {(0, 1), (0, 4), (1, 4)} <= set(got)
    exact = {
        (r["id_a"], r["id_b"]): (r["inter"], r["uni"])
        for r in D.ngram_jaccard_pairs(docs, threshold=0.1).collect()
    }
    for k, v in got.items():
        assert exact[k] == v, k

    rep = {
        (r["id_a"], r["id_b"]): (r["inter"], r["uni"])
        for r in D.minhash_lsh_pairs(
            docs.repartition(7), threshold=0.5, hash_fn="numpy"
        ).collect()
    }
    assert rep == got


def test_chunk_documents_windows_and_overlap(spark):
    from oplog_analyzer_spark.functions.packing import chunk_documents

    df = spark.createDataFrame(
        [(0, "t0 t1 t2 t3 t4 t5 t6"), (1, "short doc"), (2, "x")],
        "doc_id long, text string",
    )
    # window 4, stride 3 -> overlap 1
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["chunk_tokens"])
        for r in chunk_documents(df, max_tokens=4, stride=3).collect()
    }
    assert got == {
        (0, 0): ("t0 t1 t2 t3", 4),
        (0, 1): ("t3 t4 t5 t6", 4),
        (0, 2): ("t6", 1),
        (1, 0): ("short doc", 2),
        (2, 0): ("x", 1),
    }
    # min_chunk_tokens drops the mostly-overlap tail but never chunk 0
    got2 = {
        (r["doc_id"], r["chunk_idx"])
        for r in chunk_documents(
            df, max_tokens=4, stride=3, min_chunk_tokens=2
        ).collect()
    }
    assert got2 == {(0, 0), (0, 1), (1, 0), (2, 0)}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="SKIP"):
        chunk_documents(df, max_tokens=4, stride=5)
    with _pytest.raises(ValueError, match="positive"):
        chunk_documents(df, max_tokens=0)


def test_duplicated_span_stats_and_boilerplate(spark):
    from oplog_analyzer_spark.functions.dedup import (
        boilerplate_chunks,
        duplicated_span_stats,
    )

    shared = "c1 c2 c3 c4"  # one full window shared by docs 0 and 1
    df = spark.createDataFrame(
        [
            (0, f"{shared} a1 a2 a3 a4"),
            (1, f"{shared} b1 b2 b3 b4"),
            (2, "z1 z2 z3 z4 z5 z6 z7 z8"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_chunks"], r["dup_chunks"], r["dup_span_frac_x10000"])
        for r in duplicated_span_stats(df, window=4).collect()
    }
    # window 4, stride 4: docs 0/1 = chunks [shared, unique]; doc 2 = 2 unique
    assert got == {0: (2, 1, 5000), 1: (2, 1, 5000), 2: (2, 0, 0)}

    bp = {r["ch"]: r["n_docs"] for r in boilerplate_chunks(df, window=4).collect()}
    assert list(bp.values()) == [2]  # exactly the shared chunk, in 2 docs


def test_remove_duplicated_spans_policies(spark):
    from oplog_analyzer_spark.functions.dedup import remove_duplicated_spans

    shared = "c1 c2 c3 c4"
    df = spark.createDataFrame(
        [
            (0, f"{shared} a1 a2 a3 a4", "web"),
            (1, f"{shared} b1 b2 b3 b4", "web"),
            (2, shared, "web"),  # nothing but the duplicated span
        ],
        "doc_id long, text string, source string",
    )

    first = {
        r["doc_id"]: (r["text"], r["dropped_chunks"], r["source"])
        for r in remove_duplicated_spans(df, window=4).collect()
    }
    # keep_first: min doc_id (0) keeps the span; others lose it; doc 2
    # collapses to empty text; non-text columns ride through the join
    assert first == {
        0: (f"{shared} a1 a2 a3 a4", 0, "web"),
        1: ("b1 b2 b3 b4", 1, "web"),
        2: ("", 1, "web"),
    }

    drop = {
        r["doc_id"]: r["text"]
        for r in remove_duplicated_spans(df, window=4, policy="drop_all").collect()
    }
    assert drop == {0: "a1 a2 a3 a4", 1: "b1 b2 b3 b4", 2: ""}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="policy"):
        remove_duplicated_spans(df, policy="nope")
    with _pytest.raises(ValueError, match="min_docs"):
        remove_duplicated_spans(df, min_docs=1)


def test_trigram_model_and_coverage(spark):
    from oplog_analyzer_spark.functions.textstats import (
        trigram_coverage,
        trigram_model,
    )

    df = spark.createDataFrame(
        [
            (0, "aaaa"),     # trigrams: aaa, aaa
            (1, "aaab"),     # aaa, aab
            (2, "xyzw"),     # xyz, yzw — the tail
            (3, "ab"),       # < 3 chars → zero trigrams
            (4, None),       # NULL text → zero trigrams
        ],
        "doc_id long, text string",
    )
    # counts: aaa=3, aab=1, xyz=1, yzw=1 → top_2 = aaa then aab (tie on 1
    # broken trigram-asc)
    model = {r["g"]: r["c"] for r in trigram_model(df, top_k=2).collect()}
    assert model == {"aaa": 3, "aab": 1}

    got = {
        r["doc_id"]: (r["n_trigrams"], r["top_hits"], r["trigram_cov_x10000"])
        for r in trigram_coverage(df, top_k=2).collect()
    }
    assert got == {
        0: (2, 2, 10000),
        1: (2, 2, 10000),
        2: (2, 0, 0),
        3: (0, 0, 0),   # zero-trigram docs still emitted, score 0
        4: (0, 0, 0),
    }

    # external-model scoring: against doc 2's own trigrams, doc 2 is fluent
    ext = trigram_model(df.filter("doc_id = 2"), top_k=10)
    got2 = {
        r["doc_id"]: r["trigram_cov_x10000"]
        for r in trigram_coverage(df, model=ext).collect()
    }
    assert got2[2] == 10000 and got2[0] == 0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="top_k"):
        trigram_model(df, top_k=0)


def test_bpe_encode_word_roundtrip_property():
    """Hypothesis property (pure local, no Spark): for ANY word and ANY
    merge table, the encoded subwords concatenate back to exactly
    word + END_OF_WORD — encoding can never lose or invent bytes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from oplog_analyzer_spark.functions.bpe import END_OF_WORD, _encode_word

    words = st.text(
        alphabet=st.characters(blacklist_categories=("Zs", "Cc")),
        min_size=1, max_size=12,
    )
    merge_tables = st.lists(
        st.tuples(st.text(min_size=1, max_size=3), st.text(min_size=1, max_size=3)),
        max_size=20,
    )

    @settings(max_examples=300, deadline=None)
    @given(word=words, merges=merge_tables)
    def check(word, merges):
        ranks = {tuple(p): i for i, p in enumerate(merges)}
        out = _encode_word(word, ranks)
        assert "".join(out) == word + END_OF_WORD

    check()


def test_corpus_profile_exact_and_sketch(spark):
    """Exact profile over a known corpus; the HLL sketch form (the 100 TB
    path — one scan, mergeable state) lands within its rsd bound."""
    from oplog_analyzer_spark.functions.textstats import corpus_profile

    rows = [(i, f"doc number {i} with tokens") for i in range(200)]
    rows += [(1000 + i, rows[i][1]) for i in range(50)]     # 50 exact clones
    rows += [(2000, ""), (2001, None)]                      # degenerate texts
    df = spark.createDataFrame(rows, "doc_id long, text string")

    exact = corpus_profile(df).collect()[0].asDict()
    assert exact == {
        "n_docs": 252, "distinct_ids": 252, "distinct_texts": 201,
        # 250 real docs x 5 tokens; empty string counts 0, NULL is skipped
        "total_tokens": 1250, "min_tokens": 0, "max_tokens": 5,
    }

    approx = corpus_profile(df, approx=True).collect()[0].asDict()
    assert approx["n_docs"] == 252 and approx["total_tokens"] == 1250
    for k in ("distinct_ids", "distinct_texts"):
        assert abs(approx[k] - exact[k]) <= max(3, 0.05 * exact[k]), k


def test_bpe_learn_classic_corpus(spark):
    """The Sennrich et al. 2016 worked example: low×5 lower×2 newest×6
    widest×3 — the first five merges are hand-computable."""
    from oplog_analyzer_spark.functions.bpe import bpe_learn_merges

    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    df = spark.createDataFrame(
        [(0, " ".join(words[:8])), (1, " ".join(words[8:]))],
        "doc_id long, text string",
    )
    merges = bpe_learn_merges(df, num_merges=5)
    assert merges == [
        ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w"),
    ]
    # determinism across partitioning
    assert bpe_learn_merges(df.repartition(7), num_merges=5) == merges
    # merge budget past full merging just stops
    all_merges = bpe_learn_merges(df, num_merges=10_000)
    assert len(all_merges) < 100

    import pytest as _pytest

    with _pytest.raises(ValueError, match="num_merges"):
        bpe_learn_merges(df, num_merges=0)


def test_bpe_encode_roundtrip(spark):
    from pyspark.sql import functions as F

    from oplog_analyzer_spark.functions.bpe import (
        bpe_detokenize,
        bpe_encode,
        bpe_learn_merges,
    )

    train = spark.createDataFrame(
        [(0, "low low low low low lower lower"),
         (1, "newest newest newest newest newest newest widest widest widest")],
        "doc_id long, text string",
    )
    merges = bpe_learn_merges(train, num_merges=5)

    df = spark.createDataFrame(
        [(0, "newest low"), (1, "Zebra"), (2, None), (3, "  spaced   out ")],
        "doc_id long, text string",
    )
    enc = bpe_encode(df, merges)
    got = {r["doc_id"]: (r["bpe_tokens"], r["n_bpe_tokens"]) for r in enc.collect()}
    # ranks: es, est, est</w>, lo, low — newest → n e w est</w>; low → low </w>
    assert got[0] == (["n", "e", "w", "est</w>", "low", "</w>"], 6)
    # unseen word degrades to characters (lowercased), never fails
    assert got[1][0] == ["z", "e", "b", "r", "a", "</w>"]
    assert got[2] == ([], 0)

    # detokenization contract: join tokens, markers → spaces, == lowered
    # whitespace-normalized input
    rt = {
        r["doc_id"]: r["rt"]
        for r in enc.select("doc_id", bpe_detokenize().alias("rt")).collect()
    }
    assert rt == {0: "newest low", 1: "zebra", 2: "", 3: "spaced out"}


def test_gopher_rules_exact_values(spark):
    """Every Gopher rule fired and passed at least once on hand-computed
    docs; the driver row `gopher_quality` certifies the same expressions
    against DuckDB on the real corpus (where bullets/ellipses don't occur)."""
    good = "the " + "word " * 57 + "of have"           # 60 words, 3 stopwords
    df = spark.createDataFrame(
        [
            (0, good),
            (1, "- a b\n- c d"),                        # every line bulleted
            (2, "first line...\nsecond…\nthird"),       # ellipsis lines+symbols
            (3, "123 456 789 word5"),                   # 1/4 alpha words
            (4, "# # # word word"),                     # hash symbols
            (5, "superlongwordoftwentych"),             # mean word len 23
            (6, ""),                                    # empty text
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r.asDict() for r in TS.gopher_rules(df).collect()}

    r0 = rows[0]
    assert (r0["n_words"], r0["mean_word_len_x100"], r0["stopword_types"]) == (
        60, 395, 3)
    assert r0["gopher_ok"]

    assert rows[1]["bullet_line_frac_x10000"] == 10000
    assert not rows[1]["rule_bullet_lines"]

    r2 = rows[2]
    assert r2["ellipsis_line_frac_x10000"] == 6666   # 2 of 3 lines
    assert r2["symbol_word_ratio_x10000"] == 5000    # 2 symbols / 4 words
    assert not r2["rule_ellipsis_lines"] and not r2["rule_symbol_ratio"]

    assert rows[3]["alpha_word_frac_x10000"] == 2500
    assert not rows[3]["rule_alpha_words"]

    assert rows[4]["symbol_word_ratio_x10000"] == 6000
    assert not rows[4]["rule_symbol_ratio"]

    assert rows[5]["mean_word_len_x100"] == 2300
    assert not rows[5]["rule_mean_word_len"]

    r6 = rows[6]
    assert (r6["n_words"], r6["mean_word_len_x100"]) == (0, 0)
    assert not r6["rule_word_count"] and not r6["gopher_ok"]

    # the inline-gate Column agrees with the audit frame's conjunction
    gate_ids = {
        r["doc_id"]
        for r in df.filter(TS.gopher_ok_expr("text")).select("doc_id").collect()
    }
    assert gate_ids == {d for d, r in rows.items() if r["gopher_ok"]}

    # rules are parameterized (the paper retunes per corpus)
    loose = {
        r["doc_id"]: r["gopher_ok"]
        for r in TS.gopher_rules(
            df, min_words=1, min_stopword_types=0,
            min_mean_word_len_x100=100, max_mean_word_len_x100=10000,
            min_alpha_word_frac_x10000=0,
        ).collect()
    }
    assert loose[3] and loose[5] and not loose[1]


def test_semdedup_planted_duplicate_and_sentinels(spark):
    """SemDeDup predecessor rule on hand-built 2-D vectors: ids 0 and 1
    are IDENTICAL, so whatever the (hash-chosen) centroid is they share
    cent_sim exactly, tie-break ranks 0 before 1, and 1 must be the one
    dropped with dup_of=0 and max_prior_sim=1.0 — the only pair over
    threshold 0.99.  Rank-1 rows carry the (-2.0, -1, False) sentinels."""
    from oplog_analyzer_spark.functions.semdedup import semdedup_verdicts

    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.0]),       # exact duplicate of 0
        (2, [0.0, 1.0]),
        (3, [0.6, 0.8]),       # cos 0.6 to id 0, 0.8 to id 2
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for hash_fn in ("xxhash64", "md5"):
        out = {
            r["id"]: r.asDict()
            for r in semdedup_verdicts(
                df, n_clusters=1, threshold=0.99, hash_fn=hash_fn
            ).collect()
        }
        assert {i for i, r in out.items() if r["is_dup"]} == {1}
        assert out[1]["dup_of"] == 0 and out[1]["max_prior_sim"] == 1.0
        assert out[0]["cent_sim"] == out[1]["cent_sim"]
        assert sorted(r["rnk"] for r in out.values()) == [1, 2, 3, 4]
        first = next(r for r in out.values() if r["rnk"] == 1)
        assert (first["max_prior_sim"], first["dup_of"], first["is_dup"]) == (
            -2.0, -1, False)


def test_semdedup_threshold_monotone_and_max_cluster_cap(spark):
    """Drop set shrinks as the threshold rises; members ranked past
    max_cluster are admitted with sentinel columns (the conservative
    failure mode — missed drops, never false drops)."""
    from oplog_analyzer_spark.functions.semdedup import semdedup_verdicts

    rng = np.random.default_rng(11)
    mat = rng.standard_normal((60, 8))
    mat[13] = mat[4] + 0.01 * rng.standard_normal(8)  # planted near-dup
    rows = [(i, [float(x) for x in mat[i]]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def dropset(**kw):
        return {
            r["id"]
            for r in semdedup_verdicts(df, n_clusters=3, **kw).collect()
            if r["is_dup"]
        }

    lo, hi = dropset(threshold=0.3), dropset(threshold=0.6)
    assert hi <= lo
    # exactly ONE of the planted near-identical pair is dropped even at
    # 0.6 (which one depends on centroid-similarity rank: the member
    # farther from the centroid is kept), attributed to the other
    assert len({4, 13} & hi) == 1
    dropped = ({4, 13} & hi).pop()
    verdict = {
        r["id"]: r
        for r in semdedup_verdicts(df, n_clusters=3, threshold=0.6).collect()
    }
    assert verdict[dropped]["dup_of"] == ({4, 13} - {dropped}).pop()

    capped = semdedup_verdicts(df, n_clusters=3, threshold=0.3, max_cluster=5)
    for r in capped.collect():
        if r["rnk"] > 5:
            assert (r["max_prior_sim"], r["dup_of"], r["is_dup"]) == (
                -2.0, -1, False)
    # within the cap the verdicts match the uncapped run
    uncapped = {
        r["id"]: r["is_dup"]
        for r in semdedup_verdicts(df, n_clusters=3, threshold=0.3).collect()
    }
    for r in capped.collect():
        if r["rnk"] <= 5:
            assert r["is_dup"] == uncapped[r["id"]]


def test_dsir_tilts_toward_target_vocabulary(spark):
    """DSIR scores rank docs sharing the target subset's vocabulary above
    docs that don't; empty docs re-attach with (0, 0, 0); exactly k rows
    are selected and they are the top-k by (score_micro DESC, id ASC)."""
    from oplog_analyzer_spark.functions.dsir import dsir_weights

    rows = [
        (0, "alpha beta gamma alpha beta", "t"),       # target
        (1, "alpha gamma beta beta alpha", "t"),       # target
        (2, "alpha beta gamma beta alpha", "r"),       # raw, target-like
        (3, "zeta eta theta iota kappa", "r"),         # raw, disjoint vocab
        (4, "zeta theta eta kappa iota", "r"),
        (5, "", "r"),                                  # empty doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, grp string")
    for hash_fn in ("xxhash64", "md5"):
        out = {
            r["id"]: r.asDict()
            for r in dsir_weights(
                df, df.filter("grp = 't'"), hash_fn=hash_fn, k=3
            ).collect()
        }
        assert len(out) == 6
        assert (out[5]["n_feats"], out[5]["score_micro"]) == (0, 0)
        # the target-like raw doc outscores the disjoint-vocab docs
        assert out[2]["score_micro"] > out[3]["score_micro"]
        assert out[2]["score_micro"] > out[4]["score_micro"]
        sel = {i for i, r in out.items() if r["selected"]}
        top3 = [
            i for i, _ in sorted(
                out.items(), key=lambda kv: (-kv[1]["score_micro"], kv[0])
            )[:3]
        ]
        # selection IS the (score DESC, id ASC) top-k; the target docs
        # make the cut (the empty doc's 0 can outrank negative raw docs
        # on a corpus this tiny — that's the scoring, not a bug)
        assert sel == set(top3) and {0, 1} <= sel and 3 not in sel


def test_dsir_selected_edge_cases(spark):
    """k >= n selects everything; score ties break by ascending id (the
    k-th threshold is a (negated-score, id) struct compare)."""
    from oplog_analyzer_spark.functions.dsir import dsir_scores, dsir_selected

    scores = spark.createDataFrame(
        [(10, 4, 100, 25), (11, 4, 100, 25), (12, 4, 50, 12)],
        "id long, n_feats long, score_micro long, score_per_feat long",
    )
    all_sel = dsir_selected(scores, k=5).collect()
    assert all(r["selected"] for r in all_sel)
    two = {r["id"]: r["selected"] for r in dsir_selected(scores, k=2).collect()}
    assert two == {10: True, 11: True, 12: False}
    one = {r["id"]: r["selected"] for r in dsir_selected(scores, k=1).collect()}
    assert one == {10: True, 11: False, 12: False}  # tie -> smaller id


def test_semantic_contamination_verdicts_and_sentinels(spark):
    """Verdict fields match a hand-computed cosine table; empty eval set
    yields (-2.0, -1, 0, false) sentinels; zero-norm train vectors score
    0 against everything instead of dividing by zero; ties in max cosine
    resolve to the smallest eval id; the max_eval guard raises."""
    import pytest as _pytest

    from oplog_analyzer_spark.functions.decontam import (
        semantic_contamination_report,
    )

    train = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),   # cos 1.0 with eval 10 AND eval 11 (tie)
            (1, [0.0, 1.0]),   # cos 1.0 with eval 12, 0 with 10/11
            (2, [1.0, 1.0]),   # cos ~0.7071 with all three
            (3, [0.0, 0.0]),   # zero-norm: raw dot 0 everywhere
        ],
        "vec_id long, embedding array<double>",
    )
    evalset = spark.createDataFrame(
        [(11, [2.0, 0.0]), (10, [1.0, 0.0]), (12, [0.0, 3.0])],
        "vec_id long, embedding array<double>",
    )
    out = {
        r["id"]: r.asDict()
        for r in semantic_contamination_report(
            train, evalset, threshold=0.7
        ).collect()
    }
    assert out[0] == {
        "id": 0, "max_sim": 1.0, "top_eval_id": 10, "n_hits": 2,
        "contaminated": True,
    }
    assert out[1] == {
        "id": 1, "max_sim": 1.0, "top_eval_id": 12, "n_hits": 1,
        "contaminated": True,
    }
    assert out[2]["max_sim"] == 0.7071 and out[2]["n_hits"] == 3
    assert out[2]["contaminated"] is True
    assert out[3] == {
        "id": 3, "max_sim": 0.0, "top_eval_id": 10, "n_hits": 0,
        "contaminated": False,
    }

    empty = {
        r["id"]: r.asDict()
        for r in semantic_contamination_report(
            train, evalset.filter("vec_id < 0"), threshold=0.7
        ).collect()
    }
    assert all(
        (r["max_sim"], r["top_eval_id"], r["n_hits"], r["contaminated"])
        == (-2.0, -1, 0, False)
        for r in empty.values()
    ) and len(empty) == 4

    with _pytest.raises(ValueError, match="max_eval"):
        semantic_contamination_report(train, evalset, max_eval=2)


def test_semantic_decontaminate_keeps_unembedded_docs(spark):
    """Docs whose id has no embedding row are conservatively kept; docs
    with a contaminated vector are dropped; everything else survives with
    all original columns."""
    from oplog_analyzer_spark.functions.decontam import semantic_decontaminate

    docs = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c"), (9, "no-embedding")],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [-1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    evalset = spark.createDataFrame(
        [(100, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    kept = semantic_decontaminate(docs, emb, evalset, threshold=0.9)
    assert kept.columns == ["doc_id", "text"]
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 2, 9]


def test_temperature_factors_math(spark):
    """α=0 equalizes domain TARGETS (n_d·r_d equal across domains); α=1 is
    ≈identity (r ≈ 1 for every domain); budgets scale linearly; expected
    output size tracks the budget within the floor slack; bad inputs
    raise."""
    import pytest as _pytest

    from oplog_analyzer_spark.functions.sampling import temperature_factors

    counts = {"en": 1000, "fr": 100, "zh": 10}

    eq = temperature_factors(counts, alpha=0.0)
    targets = {d: counts[d] * r for d, r in eq.items()}
    lo, hi = min(targets.values()), max(targets.values())
    assert (hi - lo) / hi < 1e-5  # equal shares up to micro-floor slack

    ident = temperature_factors(counts, alpha=1.0)
    assert all(abs(r - 1_000_000) <= 5 for r in ident.values())

    half = temperature_factors(counts, alpha=0.5)
    assert half["zh"] > half["fr"] > 1_000_000 > half["en"]  # the tilt
    expected = sum(counts[d] * r / 1e6 for d, r in half.items())
    assert abs(expected - 1110) < 1.0

    doubled = temperature_factors(counts, alpha=0.5, budget=2220)
    assert all(abs(doubled[d] - 2 * half[d]) <= 2 for d in counts)

    for bad in (
        lambda: temperature_factors(counts, alpha=-0.1),
        lambda: temperature_factors({"en": 0}, alpha=0.5),
        lambda: temperature_factors({}, alpha=0.5),
        lambda: temperature_factors(counts, alpha=0.5, budget=0),
    ):
        with _pytest.raises(ValueError):
            bad()


def test_temperature_upsample_copies_and_determinism(spark):
    """Every kept row appears with copy_idx 0..n_copies−1 for a per-doc
    count that is base-or-base+1 of its domain factor; reruns are
    byte-identical; NULL domains drop; xxhash64 and md5 modes agree on
    the copy-count SHAPE (both hash-uniform)."""
    from collections import Counter

    from oplog_analyzer_spark.functions.sampling import (
        temperature_factors,
        temperature_upsample,
    )

    rows = [(i, "big" if i < 90 else "small") for i in range(100)]
    rows.append((1000, None))  # NULL domain must drop
    df = spark.createDataFrame(rows, "doc_id long, dom string")
    factors = temperature_factors({"big": 90, "small": 10}, alpha=0.5)

    out = temperature_upsample(df, "dom", alpha=0.5, id_col="doc_id").collect()
    assert all(r["doc_id"] != 1000 for r in out)
    per_doc = Counter(r["doc_id"] for r in out)
    doms = {r["doc_id"]: r["dom"] for r in out}
    for doc, n in per_doc.items():
        base = factors[doms[doc]] // 1_000_000
        assert n in (base, base + 1)
        # contiguous copy indexes
        idxs = sorted(r["copy_idx"] for r in out if r["doc_id"] == doc)
        assert idxs == list(range(n))
    # small domain upsampled above 1x on average, big thinned below
    small_n = sum(n for d, n in per_doc.items() if doms[d] == "small")
    big_n = sum(n for d, n in per_doc.items() if doms[d] == "big")
    assert small_n > 10 and big_n < 90

    again = temperature_upsample(df, "dom", alpha=0.5, id_col="doc_id").collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_clean_text_normalization_and_strips(spark):
    """NFC collapses decomposed sequences (so exact dedup sees one form),
    controls/zero-width strip with correct counts, whitespace squeezes,
    ASCII rows short-circuit unchanged, NFKC additionally folds the fi
    ligature, and bad forms raise."""
    import pytest as _pytest

    from oplog_analyzer_spark.functions.textstats import clean_text

    rows = [
        (0, "café and café"),          # decomposed + precomposed
        (1, "a\x01\x07b\x0b c  d"),               # controls + squeeze
        (2, "z​‍﻿z �"),       # zero-width + mojibake
        (3, "plain ascii text"),                   # short-circuit path
        (4, "ﬁn du ﬁn"),                # ligature: NFC keeps
        (5, None),                                 # NULL rides through
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in clean_text(df).collect()}

    assert out[0]["text_clean"] == "café and café"
    assert out[0]["changed"] is True
    assert out[1]["text_clean"] == "ab c d"
    assert (out[1]["n_controls"], out[1]["changed"]) == (3, True)
    assert out[2]["text_clean"] == "zz �"
    assert (out[2]["n_zerowidth"], out[2]["n_replacement"]) == (3, 1)
    assert out[3]["text_clean"] == "plain ascii text"
    assert out[3]["changed"] is False
    assert out[4]["text_clean"] == "ﬁn du ﬁn"  # NFC preserves
    assert out[5]["text_clean"] is None and out[5]["changed"] is None

    nfkc = {
        r["doc_id"]: r["text_clean"]
        for r in clean_text(df, form="NFKC").collect()
    }
    assert nfkc[4] == "fin du fin"  # compatibility fold

    with _pytest.raises(ValueError, match="normalization form"):
        clean_text(df, form="NFX")


def test_packing_report_accounting(spark):
    """The report's identity holds (padding = n_seqs*max − total), an
    oversize doc never pollutes a clean sequence's fill stats, and the
    degenerate everything-oversize corpus reports zeros instead of
    dividing by zero."""
    from oplog_analyzer_spark.functions.packing import (
        pack_sequences,
        packing_report,
    )

    rows = [(i, 30 + (i % 3) * 10) for i in range(20)]  # 30/40/50 tokens
    rows.append((100, 500))  # oversize vs max_tokens=90
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    packed = pack_sequences(df, max_tokens=90, n_buckets=2, seed=5)
    rep = packing_report(packed, max_tokens=90).collect()[0].asDict()
    assert rep["n_docs_packed"] == 20 and rep["n_oversize"] == 1
    assert rep["oversize_tokens"] == 500
    assert rep["total_tokens_packed"] == sum(n for _, n in rows[:20])
    assert rep["padding_tokens"] == rep["n_seqs"] * 90 - rep["total_tokens_packed"]
    assert rep["utilization_x10000"] == (
        10000 * rep["total_tokens_packed"] // (rep["n_seqs"] * 90)
    )
    assert 0 < rep["min_fill"] <= rep["max_fill"] <= 90

    all_over = spark.createDataFrame(
        [(0, 1000), (1, 2000)], "doc_id long, n_tokens long"
    )
    rep0 = packing_report(
        pack_sequences(all_over, max_tokens=90, n_buckets=2, seed=5),
        max_tokens=90,
    ).collect()[0].asDict()
    assert rep0["n_seqs"] == 0 and rep0["utilization_x10000"] == 0
    assert rep0["n_oversize"] == 2 and rep0["padding_tokens"] == 0


def test_uniform_sample_k_exactness_and_edges(spark):
    """Exactly k rows, equal to the brute-force (hash, id) rank top-k;
    k >= n selects all; NULL ids never selected; reruns identical;
    nested property: sample(5) ⊂ sample(10) (same seed — the threshold
    only moves outward); k <= 0 raises."""
    import pytest as _pytest

    from oplog_analyzer_spark.functions.hashing import seeded_hash
    from oplog_analyzer_spark.functions.sampling import uniform_sample_k

    rows = [(i,) for i in range(50)] + [(None,)]
    df = spark.createDataFrame(rows, "doc_id long")

    got10 = sorted(
        r["doc_id"] for r in uniform_sample_k(df, 10, seed=3).collect()
    )
    ranked = (
        df.filter("doc_id IS NOT NULL")
        .select("doc_id", seeded_hash(3, F.col("doc_id")).alias("h"))
        .orderBy("h", "doc_id")
        .collect()
    )
    assert got10 == sorted(r["doc_id"] for r in ranked[:10])
    assert None not in got10

    got5 = {r["doc_id"] for r in uniform_sample_k(df, 5, seed=3).collect()}
    assert got5 < set(got10)
    assert len(got5) == 5

    all_rows = uniform_sample_k(df, 100, seed=3).collect()
    assert len(all_rows) == 50  # NULL id excluded even at k >= n

    again = sorted(
        r["doc_id"] for r in uniform_sample_k(df, 10, seed=3).collect()
    )
    assert again == got10

    assert uniform_sample_k(df.filter("doc_id < 0"), 3).count() == 0
    with _pytest.raises(ValueError, match="positive"):
        uniform_sample_k(df, 0)


def test_token_budget_sample_carve_semantics(spark):
    """Kept set == the naive global cumulative-window rule (take in
    (bucket, hash, id) order while predecessors total < budget, crossing
    doc included); budget edges (0, exact fit, >= total); NULL ids drop;
    token column passthrough; the boundary-bucket decomposition agrees
    with a 1-bucket (fully-windowed) run."""
    from oplog_analyzer_spark.functions.hashing import seeded_hash
    from oplog_analyzer_spark.functions.sampling import token_budget_sample

    rows = [(i, "tok " * (i % 7 + 1)) for i in range(80)] + [(None, "x y")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def naive(budget, n_buckets):
        # brute force in python: reproduce order (bucket, hash, id)
        hs = {
            r["doc_id"]: r["h"]
            for r in df.filter("doc_id IS NOT NULL")
            .select("doc_id", seeded_hash(5, F.col("doc_id")).alias("h"))
            .collect()
        }
        toks = {i: (i % 7 + 1) for i in range(80)}
        order = sorted(hs, key=lambda i: (hs[i] % n_buckets, hs[i], i))
        kept, run = set(), 0
        for i in order:
            if run < budget:
                kept.add(i)
            run += toks[i]
        return kept

    for budget in (0, 1, 37, 160, 10_000):
        for nb in (1, 8, 256):
            got = {
                r["doc_id"]
                for r in token_budget_sample(
                    df, budget, seed=5, n_buckets=nb
                ).collect()
            }
            assert got == naive(budget, nb), (budget, nb)
            assert None not in got

    out = token_budget_sample(df, 50, seed=5)
    assert out.columns == ["doc_id", "text"]
    with_tok = df.withColumn("n_tokens", F.size(F.split(F.trim("text"), r"\s+")))
    out2 = token_budget_sample(
        with_tok, 50, tokens_col="n_tokens", seed=5
    )
    assert out2.columns == ["doc_id", "text", "n_tokens"]
    assert {r["doc_id"] for r in out2.collect()} == {
        r["doc_id"] for r in out.collect()
    }


def test_score_quantile_buckets_semantics(spark):
    """Tertile sizes within one of n/3 on a tie-free score; a massive tie
    lands whole in one bucket; NULL scores get NULL buckets; all-ties
    degenerates to one bucket; max_distinct guard raises; n_buckets < 2
    raises."""
    import pytest as _pytest

    from oplog_analyzer_spark.functions.sampling import score_quantile_buckets

    df = spark.createDataFrame(
        [(i, i * 7 % 90) for i in range(90)] + [(1000, None)],
        "doc_id long, s long",
    )
    out = {r["doc_id"]: r["qbucket"] for r in
           score_quantile_buckets(df, "s", n_buckets=3).collect()}
    assert out[1000] is None
    from collections import Counter

    sizes = Counter(v for k, v in out.items() if k != 1000)
    assert set(sizes) == {0, 1, 2} and all(abs(c - 30) <= 1 for c in sizes.values())
    # bucket order follows score order
    by_score = {k: k * 7 % 90 for k in out if k != 1000}
    for a in by_score:
        for b in by_score:
            if by_score[a] < by_score[b]:
                assert out[a] <= out[b]

    tied = spark.createDataFrame(
        [(i, 5) for i in range(50)] + [(100 + i, 9) for i in range(10)],
        "doc_id long, s long",
    )
    t = {r["doc_id"]: r["qbucket"] for r in
         score_quantile_buckets(tied, "s", n_buckets=3).collect()}
    assert all(t[i] == t[0] for i in range(50))        # the tie mass together
    assert all(t[100 + i] > t[0] for i in range(10))   # above both thresholds

    one = spark.createDataFrame([(i, 7) for i in range(9)], "doc_id long, s long")
    assert {r["qbucket"] for r in
            score_quantile_buckets(one, "s").collect()} == {0}

    with _pytest.raises(ValueError, match="max_distinct"):
        score_quantile_buckets(df, "s", max_distinct=5)
    with _pytest.raises(ValueError, match="n_buckets"):
        score_quantile_buckets(df, "s", n_buckets=1)


def test_token_budget_boundary_bucket_strict(spark):
    """A bucket whose prefix END == budget must be treated as the boundary
    bucket (ADVICE r06): a zero-token doc at its end has predecessor-sum
    == budget and the documented strict 'cumulative < budget' rule drops
    it — the former <=-fast-path kept the whole bucket."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from oplog_analyzer_spark.functions.hashing import seeded_hash
    from oplog_analyzer_spark.functions.sampling import token_budget_sample

    rows = [(i, " ".join(["w"] * (3 if i % 4 else 0))) for i in range(64)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for budget in (1, 9, 24, 48, 96, 144):
        kept = token_budget_sample(df, budget, seed=11, n_buckets=4)
        got = {r["doc_id"] for r in kept.collect()}
        # naive single-window oracle over the same (bucket, hash, id) order
        h = seeded_hash(11, F.col("doc_id"), "xxhash64")
        ordered = df.withColumn("__h", h).withColumn(
            "__b", F.pmod(F.col("__h"), F.lit(4)).cast("int")
        ).withColumn("__n", F.size(F.split(F.trim("text"), r"\s+")))
        ordered = ordered.withColumn(
            "__n", F.when(F.trim("text") == "", 0).otherwise(F.col("__n"))
        )
        w = Window.orderBy("__b", "__h", "doc_id").rowsBetween(
            Window.unboundedPreceding, -1
        )
        naive = ordered.withColumn(
            "__cum", F.coalesce(F.sum("__n").over(w), F.lit(0))
        ).filter(F.col("__cum") < budget)
        want = {r["doc_id"] for r in naive.collect()}
        assert got == want, (budget, sorted(got ^ want))

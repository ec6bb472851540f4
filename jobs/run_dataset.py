"""spark-submit entry point: the training-data pipeline over a documents
table — dedup → quality gate → split → stratified sample → pack → epoch
shuffle, every stage optional and composable (the §2.11 operator family as
a runnable command, the way run_scan/run_tail expose the reference's
surface).

  spark-submit --py-files dist/oplog_analyzer_spark.zip jobs/run_dataset.py \
    --input docs.parquet --output <dir> \
    [--dedup exact|ngram|minhash|simhash] [--dedup-threshold 0.8] \
    [--minhash-hashes 32] [--minhash-bands 8] [--max-bucket N] \
    [--quality-gate] \
    [--split train=0.98,val=0.01,test=0.01] \
    [--sample-strata lang --sample-fractions en=0.5,de=1.0] \
    [--pack 2048] [--shuffle-seed 7] [--seed 42] [--hash xxhash64|md5]

Prints ONE JSON summary line.  Per-stage row counts ride the single write
action as ``Observation`` metrics — no extra count() scans (the
run_sample --style reference lesson, VERDICT r04 #2).
"""

from __future__ import annotations

import argparse
import json


def _parse_weights(spec: str) -> dict[str, float]:
    out = {}
    for part in spec.split(","):
        name, _, frac = part.partition("=")
        out[name.strip()] = float(frac)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument(
        "--dedup", choices=["exact", "ngram", "minhash", "simhash"],
        help="dedup strategy; near-dup pairs resolve to a keep set via one "
        "anti-join (cluster_dedup_keep)",
    )
    ap.add_argument("--dedup-threshold", type=float, default=0.8,
                    help="jaccard threshold for ngram/minhash")
    ap.add_argument("--minhash-hashes", type=int, default=32)
    ap.add_argument("--minhash-bands", type=int, default=8)
    ap.add_argument(
        "--max-bucket", type=int,
        help="hot-bucket cap for minhash LSH (deterministic, band-dependent)",
    )
    ap.add_argument("--quality-gate", action="store_true",
                    help="drop docs failing the quality_score gate "
                    "(quality_ok: >=5 tokens, punctuation < 1/4 of bytes, "
                    ">=1 stopword type)")
    ap.add_argument("--split",
                    help="deterministic hash split, e.g. train=0.98,val=0.01,test=0.01")
    ap.add_argument("--sample-strata", help="stratum column for --sample-fractions")
    ap.add_argument("--sample-fractions",
                    help="per-stratum keep fractions, e.g. en=0.5,de=1.0 "
                    "(unlisted strata are dropped)")
    ap.add_argument("--pack", type=int,
                    help="pack into sequences of at most this many tokens "
                    "(adds bucket/seq_idx/oversize; n_tokens derived from "
                    "the text when absent)")
    ap.add_argument("--shuffle-seed", type=int,
                    help="deterministic epoch-shuffle sort before the write")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--hash", choices=["xxhash64", "md5"], default="xxhash64",
                    help="hash family for split/sample/pack (md5 = the "
                    "SQL-certifiable form)")
    args = ap.parse_args()

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from oplog_analyzer_spark.functions import dedup as D
    from oplog_analyzer_spark.functions import packing as P
    from oplog_analyzer_spark.functions import sampling as SP
    from oplog_analyzer_spark.functions import textstats as TS
    from oplog_analyzer_spark.session import get_spark

    spark = get_spark(master=None, app_name="oplog-dataset")
    df = spark.read.parquet(args.input)
    observations = {}

    def observe(stage: str, frame):
        obs = Observation(stage)
        observations[stage] = obs
        return frame.observe(obs, F.count(F.lit(1)).alias("rows"))

    df = observe("rows_in", df)

    if args.dedup == "exact":
        keep = D.exact_dedup(df, args.id_col, args.text_col).select(
            F.col("keep_id").alias(args.id_col)
        )
        df = df.join(keep, args.id_col, "left_semi")
    elif args.dedup:
        if args.dedup == "ngram":
            pairs = D.ngram_jaccard_pairs(
                df, args.id_col, args.text_col,
                threshold=args.dedup_threshold, max_doc_freq=10_000,
            )
        elif args.dedup == "minhash":
            pairs = D.minhash_lsh_pairs(
                df, args.id_col, args.text_col,
                num_hashes=args.minhash_hashes, bands=args.minhash_bands,
                threshold=args.dedup_threshold, max_bucket=args.max_bucket,
            )
        else:
            pairs = D.simhash_pairs(df, args.id_col, args.text_col)
        keep = D.cluster_dedup_keep(
            pairs, df.select(F.col(args.id_col).alias("id"))
        ).select(F.col("id").alias(args.id_col))
        df = df.join(keep, args.id_col, "left_semi")
    if args.dedup:
        df = observe("rows_after_dedup", df)

    if args.quality_gate:
        base_cols = df.columns
        df = TS.quality_score(df, args.text_col).filter("quality_ok").select(base_cols)
        df = observe("rows_after_quality", df)

    if args.split:
        df = SP.hash_split(
            df, args.id_col, _parse_weights(args.split),
            seed=args.seed, hash_fn=args.hash,
        )

    if args.sample_fractions:
        if not args.sample_strata:
            ap.error("--sample-fractions requires --sample-strata")
        df = SP.stratified_sample_fraction(
            df, [args.sample_strata], _parse_weights(args.sample_fractions),
            id_col=args.id_col, seed=args.seed + 1, hash_fn=args.hash,
        )
        df = observe("rows_after_sample", df)

    if args.pack:
        if "n_tokens" not in df.columns:
            df = TS.token_count(df, args.text_col)
        df = P.pack_sequences(
            df, id_col=args.id_col, max_tokens=args.pack,
            seed=args.seed + 2, hash_fn=args.hash,
        )

    if args.shuffle_seed is not None:
        df = P.shuffle_deterministic(df, args.id_col, seed=args.shuffle_seed)

    writer = df.write.mode("overwrite")
    if args.split:
        writer = writer.partitionBy("split")
    writer.parquet(args.output)

    summary = {stage: obs.get["rows"] for stage, obs in observations.items()}
    summary["output"] = args.output
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

"""spark-submit entry point for the training-corpus preparation pipeline
(plans/corpus.py) — the LLM-data twin of tools/submit_pipeline.py.

    python tools/make_pyfiles_zip.py                 # -> dist/wcsp.zip
    spark-submit --master <cluster> \\
        --py-files dist/wcsp.zip \\
        tools/submit_corpus.py \\
        --docs <parquet dir> --out <dir> \\
        [--eval <parquet dir>] [--langs en,es] [--holdout 0.01] \\
        [--seq-budget 4096] [--decontam-n 13]

Writes each produced stage (deduped corpus, optional decontaminated
set, train/holdout splits, packed sequences) as parquet under --out.
Uses the ambient SparkSession created by spark-submit, so the same
script runs at N and 4N executors unchanged.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="input documents parquet dir (doc_id, text)")
    ap.add_argument("--out", required=True, help="output root for corpus stages")
    ap.add_argument("--eval", default=None, help="held-out eval parquet dir for decontamination")
    ap.add_argument("--langs", default=None, help="comma-separated language allowlist")
    ap.add_argument("--holdout", type=float, default=0.01)
    ap.add_argument("--seq-budget", type=int, default=4096)
    ap.add_argument("--decontam-n", type=int, default=13)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from water_column_sonar_processing_spark.plans.corpus import prepare_corpus

    spark = SparkSession.builder.appName("wcsp-corpus").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    docs = spark.read.parquet(args.docs)
    eval_df = spark.read.parquet(args.eval) if args.eval else None
    out = prepare_corpus(
        docs,
        langs=tuple(args.langs.split(",")) if args.langs else None,
        holdout_fraction=args.holdout,
        seq_budget=args.seq_budget,
        eval_df=eval_df,
        decontam_n=args.decontam_n,
    )
    # annotated/filtered are lazy intermediates of the later stages; write
    # the decision-bearing outputs (each write re-derives only its own
    # lineage — at scale, materialize 'deduped' first and iterate on
    # splits/packing downstream, as the plans/corpus.py docstring notes)
    for name in ("deduped", "decontaminated", "train", "holdout", "packed_train", "packed_holdout"):
        if name not in out:
            continue
        path = f"{args.out}/{name}"
        out[name].write.mode("overwrite").parquet(path)
        print(f"{name}: {path} rows={spark.read.parquet(path).count()}")


if __name__ == "__main__":
    main()

"""End-to-end corpus preparation over the driver's documents table:
stage invariants + cross-stage consistency."""

from __future__ import annotations

import pyspark.sql.functions as F

from water_column_sonar_processing_spark.plans.corpus import prepare_corpus

SF = "/root/testdata/sf0.001"


def test_prepare_corpus_end_to_end(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    out = prepare_corpus(docs, holdout_fraction=0.1, seq_budget=512)

    n_docs = docs.count()
    n_filtered = out["filtered"].count()
    n_deduped = out["deduped"].count()
    assert 0 < n_filtered <= n_docs
    assert 0 < n_deduped <= n_filtered

    # split partitions the deduped set exactly
    n_train, n_hold = out["train"].count(), out["holdout"].count()
    assert n_train + n_hold == n_deduped
    assert n_hold > 0
    overlap = out["train"].join(out["holdout"], "doc_id").count()
    assert overlap == 0

    # packing covers every train doc once, with in-sequence offsets
    packed = out["packed_train"]
    assert packed.count() == n_train
    bad = packed.filter((F.col("seq_off") < 0) | (F.col("seq_off") >= 512)).count()
    assert bad == 0
    # stream offsets are consistent: seq_id = stream_off div budget
    mism = packed.filter(F.col("seq_id") != (F.col("stream_off") / 512).cast("long")).count()
    assert mism == 0

    # annotations survive the chain (schema propagates)
    assert {"lang_pred", "quality_x1000", "n_tokens"} <= set(out["train"].columns)


def test_prepare_corpus_lang_filter(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    out = prepare_corpus(docs, langs=("en",), holdout_fraction=0.0)
    langs = {r["lang_pred"] for r in out["filtered"].select("lang_pred").distinct().collect()}
    assert langs <= {"en"}
    assert out["holdout"].count() == 0


def test_prepare_corpus_decontaminates_against_eval(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    # held-out eval slice: the same split the decontaminate contract query
    # uses (doc_id % 25 == 0), n=4 to match the short synthetic docs
    eval_df = docs.filter(F.col("doc_id") % 25 == 0)
    train_docs = docs.filter(F.col("doc_id") % 25 != 0)
    out = prepare_corpus(
        train_docs, holdout_fraction=0.0, eval_df=eval_df, decontam_n=4
    )
    n_dedup = out["deduped"].count()
    n_clean = out["decontaminated"].count()
    assert 0 < n_clean < n_dedup  # something was dropped, not everything
    # no surviving doc shares a 4-gram with the eval set
    from water_column_sonar_processing_spark.operators.decontam import ngram_decontaminate

    leftover = ngram_decontaminate(out["decontaminated"], eval_df, n=4).count()
    assert leftover == 0
    # split operates on the decontaminated set
    assert out["train"].count() == n_clean


def test_prepare_corpus_repetition_filter_drops_planted_doc(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    spammy = spark.createDataFrame(
        [(990001, " ".join(["spam ham jam"] * 40))], ["doc_id", "text"]
    )
    both = docs.union(spammy)
    out = prepare_corpus(both, holdout_fraction=0.0, repetition=True)
    kept = {r["doc_id"] for r in out["filtered"].select("doc_id").collect()}
    assert 990001 not in kept
    base = prepare_corpus(both, holdout_fraction=0.0)
    kept_base = {r["doc_id"] for r in base["filtered"].select("doc_id").collect()}
    assert 990001 in kept_base  # quality-score filter alone lets it through

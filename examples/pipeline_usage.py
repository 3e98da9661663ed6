#!/usr/bin/env python3
"""cae-polars-tools-spark example: an LLM training-data pipeline.

The operators beyond the reference surface, chained the way a
pretraining pipeline actually runs them — on the synthetic
``documents`` table:

1. PII redaction (emails/IPs/phones → placeholder tokens)
2. exact dedup (md5 fingerprint groups → canonical copies only)
3. MinHash-LSH near-dup removal (drop the larger doc_id of each pair)
4. benchmark decontamination (13-gram verbatim overlap)
5. Gopher-style quality gate (word count / word length / alpha
   fraction / stopword rules), repetition filter (dup-word +
   top-bigram fractions), unigram-LM log-prob filter (CCNet shape),
   and a per-domain cap (salted deterministic md5 rank)
6. deterministic train/val/test split (hash-based, leakage-safe)
7. sequence packing into fixed token budgets
8. layout for serving: compaction to target-sized files + a bucketed
   table so downstream per-doc joins plan with zero exchanges

Run: ``python examples/pipeline_usage.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cae_polars_tools_spark.io import read_table  # noqa: E402
from cae_polars_tools_spark.operators.dedup import (  # noqa: E402
    fingerprint,
    minhash_lsh_pairs,
)
from cae_polars_tools_spark.operators.pipeline import (  # noqa: E402
    decontaminate,
    pack_sequences,
    split_by_hash,
)
from cae_polars_tools_spark.operators.text import tokens  # noqa: E402
from cae_polars_tools_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="cae-polars-tools-spark-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    docs = read_table(spark, sf_dir, "documents")
    n0 = docs.count()
    print(f"corpus: {n0} documents")

    # 0. PII redaction: chained JVM regexes, zero shuffle — runs
    # first so no later stage (or its caches) ever sees raw PII
    from cae_polars_tools_spark.operators.text import redact_pii

    docs = docs.withColumn("text", redact_pii("text"))

    # 1. exact dedup: one 16-byte-fingerprint shuffle; keep each
    # group's minimum doc_id (deterministic canonical choice)
    canonical = (
        docs.select("doc_id", fingerprint("text").alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    docs = docs.join(canonical, "doc_id", "left_semi")
    n1 = docs.count()
    print(f"after exact dedup: {n1} (-{n0 - n1})")

    # 2. near-dup removal: drop the larger id of every jaccard>=0.8 pair
    pairs = minhash_lsh_pairs(docs)
    drop = pairs.select(F.col("doc_id_b").alias("doc_id")).distinct()
    docs = docs.join(F.broadcast(drop), "doc_id", "left_anti")
    n2 = docs.count()
    print(f"after near-dup removal: {n2} (-{n1 - n2})")

    # 2-ter. the NIGHTLY version of steps 1-2: persist the deduped
    # corpus as a MinHash-LSH band index once, then dedup an arriving
    # batch against it in O(batch) — history text never re-read,
    # history signatures never recomputed — and append the survivors
    # so tomorrow's cycle sees them
    from cae_polars_tools_spark.operators.minhash_index import (
        append_minhash_index,
        build_minhash_index,
        incremental_dedup_indexed,
    )

    idx_root = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".tmp",
        "pipeline_minhash_idx",
    )
    import shutil

    shutil.rmtree(idx_root, ignore_errors=True)
    build_minhash_index(docs, idx_root)
    tonight = docs.limit(3).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        "source",
        "text",  # verbatim copies: every one must drop as a near-dup
    ).unionByName(
        spark.createDataFrame(
            [(2_000_000, "srcZ", "a genuinely new document " * 6)],
            "doc_id long, source string, text string",
        )
    )
    survivors = incremental_dedup_indexed(spark, idx_root, tonight)
    n_new = survivors.count()
    append_minhash_index(
        spark, idx_root,
        tonight.join(survivors.select("doc_id"), "doc_id", "left_semi"),
    )
    print(
        f"nightly ingest vs persisted index: {n_new}/4 batch docs "
        "survive (3 verbatim copies dropped), survivors appended"
    )

    # 2-bis. span-level boilerplate strip: cut every substring that
    # repeats verbatim across >= 3 surviving docs (the ExactSubstr
    # modality — document-level dedup can't see shared spans inside
    # otherwise-distinct documents)
    from cae_polars_tools_spark.operators.dedup import cut_repeated_spans

    stripped = cut_repeated_spans(docs, min_docs=3)
    n_cut = stripped.agg(F.sum("n_cut")).first()[0] or 0
    docs = (
        docs.join(
            stripped.select("doc_id", "cleaned"), "doc_id", "left"
        )
        .withColumn("text", F.coalesce("cleaned", "text"))
        .drop("cleaned")
        .filter(F.length("text") > 0)
    )
    print(f"span strip: {n_cut} boilerplate chars removed")

    # 3. decontaminate against a toy benchmark (a verbatim 15-token
    # span of one corpus doc, so exactly that doc gets dropped)
    sample = docs.filter(F.size(tokens("text")) >= 20).limit(1).collect()
    bench_text = " ".join(sample[0]["text"].split(" ")[:15]) if sample else "x"
    benchmark = spark.createDataFrame(
        [(0, bench_text)], "bench_id long, text string"
    )
    docs = decontaminate(docs, benchmark)
    n3 = docs.count()
    print(f"after decontamination: {n3} (-{n2 - n3})")

    # 4. Gopher-style quality gate: per-row expressions, no shuffle
    # (a laxer word floor than the published 50 — the synthetic docs
    # are short; the rule STRUCTURE is what the pipeline exercises)
    from cae_polars_tools_spark.operators.text import (
        QUALITY_MIN_STOPWORDS,
        quality_signals,
    )

    s = quality_signals("text")
    docs = (
        docs.withColumn("n_words", s["n_words"])
        .withColumn("mean_word_len", s["mean_word_len"])
        .withColumn("n_stopwords", s["n_stopwords"])
        .filter(
            (F.col("n_words") >= 20)
            & F.col("mean_word_len").between(3.0, 10.0)
            & (F.col("n_stopwords") >= QUALITY_MIN_STOPWORDS)
        )
        .drop("n_words", "mean_word_len", "n_stopwords")
    )
    n4 = docs.count()
    print(f"after quality gate: {n4} (-{n3 - n4})")

    # 4-bis. model-based quality score: train a logistic classifier on
    # a bounded seeded sample labeled by a heuristic (here: longer
    # docs), then score the whole corpus as zero-shuffle expressions —
    # the fasttext-classifier stage of a production curation pipeline
    from cae_polars_tools_spark.operators.classifier import (
        sample_training_frame,
        score_quality_lr,
        train_quality_lr,
    )

    X, y = sample_training_frame(
        docs, F.length("text") > 250, sample_rows=512
    )
    w_lr, b_lr = train_quality_lr(X, y)
    scored = score_quality_lr(docs, w_lr, b_lr)
    n_hi = scored.filter("quality_score >= 0.5").count()
    print(f"learned quality model scores {n_hi}/{n4} docs >= 0.5")

    # 4a. repetition filter: the other half of the Gopher rules —
    # duplicate-word fraction (zero-shuffle HOF) and top-bigram
    # fraction (one map-side-combined (doc, bigram) count)
    from cae_polars_tools_spark.operators.text import repetition_report

    # laxer thresholds than the published keep verdict — the synthetic
    # docs draw from a tiny vocabulary, so natural-text cutoffs would
    # gut the corpus; the rule STRUCTURE is what the pipeline exercises
    rep_keep = (
        repetition_report(docs)
        .filter("dup_word_frac <= 0.68 AND top_bigram_frac <= 0.15")
        .select("doc_id")
    )
    docs = docs.join(F.broadcast(rep_keep), "doc_id", "left_semi")
    n4a = docs.count()
    print(f"after repetition filter: {n4a} (-{n4 - n4a})")

    # 4a'. model-based filter: mean unigram log-prob per doc (CCNet
    # shape: broadcast model, corpus never shuffles for it); drop the
    # lowest-scoring ~10% via a sketched percentile cutoff. Cached:
    # the quantile sketch and the semi-join both consume the scores.
    from cae_polars_tools_spark.operators.text import logprob_report

    scored = logprob_report(docs).select("doc_id", "avg_logprob").persist()
    try:
        (cut,) = scored.approxQuantile("avg_logprob", [0.1], 0.01)
        docs = docs.join(
            F.broadcast(scored.filter(F.col("avg_logprob") >= cut)),
            "doc_id",
            "left_semi",
        )
        n4lp = docs.count()
    finally:
        scored.unpersist()
    print(f"after unigram-LM filter (cut {cut:.3f}): {n4lp} (-{n4a - n4lp})")

    # 4a''. per-domain cap: no source may contribute more than 22
    # docs (deterministic md5 rank; the salted pre-cap bounds the
    # hot-domain window at scale)
    from cae_polars_tools_spark.operators.pipeline import cap_per_key

    docs = cap_per_key(docs, "source", 22, "doc_id", presalt=4)
    n4c = docs.count()
    print(f"after per-domain cap: {n4c} (-{n4lp - n4c})")

    # 4b. data mixing: rebalance sources to target weights (here 3:1
    # for the src1x half) — water-filling keeps the over-weighted half
    # whole and thins the rest, deterministically by md5 threshold
    from cae_polars_tools_spark.operators.pipeline import mix_sources

    docs = mix_sources(
        docs,
        "source",
        lambda s: F.when(s.like("src1_"), F.lit(3.0)).otherwise(F.lit(1.0)),
        "doc_id",
    )
    n4b = docs.count()
    print(f"after source mixing: {n4b} (-{n4c - n4b})")

    # 5. deterministic split — stable across reruns and data growth,
    # equal keys always co-locate (no train/test leakage)
    split = split_by_hash(
        docs, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}
    )
    split.groupBy("split").count().orderBy("split").show()

    # 6. tokenize with a REAL byte-level BPE (merges trained on a
    # bounded seeded sample, encode as a zero-shuffle map) and pack
    # the train split into 512-token samples
    from cae_polars_tools_spark.operators.tokenizer import (
        bpe_merges_from_docs,
        tokenize_bpe,
    )

    merges = bpe_merges_from_docs(docs, n_merges=64, sample_rows=512)
    train = tokenize_bpe(
        split.filter("split = 'train'"), merges
    )
    n_train = train.count()
    packed = pack_sequences(train, budget=512)
    summary = packed.groupBy("pack_id").agg(F.sum("n_tokens").alias("tokens"))
    n_packs = summary.count()
    fill = summary.agg(F.avg("tokens")).collect()[0][0]
    print(
        f"packed {n_train} docs into {n_packs} samples, "
        f"avg fill {fill:.0f}/512 tokens"
    )

    # 7. physical layout: compact the packed manifest to ~1 MB files,
    # then publish a doc_id-bucketed table — later per-doc joins
    # (attach text, attach embeddings) plan with ZERO exchanges
    from cae_polars_tools_spark.storage import compact_parquet, write_bucketed

    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".tmp", "pipeline"
    )
    raw, compacted = os.path.join(out, "packed_raw"), os.path.join(out, "packed")
    packed.write.mode("overwrite").parquet(raw)
    n_files = compact_parquet(spark, raw, compacted, target_file_bytes=1 << 20)
    spark.sql("DROP TABLE IF EXISTS train_packed")
    write_bucketed(
        spark.read.parquet(compacted), "train_packed", ["doc_id"], 4,
        path=os.path.join(out, "train_packed"),
    )
    join_plan = (
        spark.table("train_packed")
        .groupBy("doc_id")
        .count()
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    print(
        f"published {n_files} compacted files; bucketed table "
        f"'train_packed' (exchange-free group-by: "
        f"{'Exchange' not in join_plan})"
    )
    print("Pipeline complete.")


if __name__ == "__main__":
    main()

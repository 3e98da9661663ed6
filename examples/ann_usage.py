#!/usr/bin/env python3
"""cae-polars-tools-spark example: the ANN / similarity-search family.

The full cascade a 100 TB vector corpus runs, on the synthetic
``embeddings`` table (vec_id, array<float>, label):

1. brute-force cosine top-k — the exactness baseline (one scoring map
   over the corpus, bounded survivor shuffle)
2. sign-LSH with multi-probe — sub-linear candidates, query-side
   recall dial (nothing re-indexes)
3. IVF with the deterministic parity quantizer — coarse routing to
   nprobe inverted lists
4. IVF-PQ + exact re-rank — the billion-scale layout: the corpus
   persists as 8 codebook ids per row (~64x scan shrink), ADC scores
   via table lookups, float vectors fetched only for the bounded
   re-rank set
5. PCA train + project — one distributed pass (dim² cells shuffle,
   never rows), zero-shuffle projection

Run: ``python examples/ann_usage.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cae_polars_tools_spark.io import read_table, spread  # noqa: E402
from cae_polars_tools_spark.operators.similarity import (  # noqa: E402
    PCA_K,
    PQ_RERANK,
    append_ivfpq_index,
    bruteforce_topk,
    build_ivfpq_index,
    compact_ivfpq_index,
    delete_ivfpq_index,
    ivf_topk,
    ivfpq_topk,
    lsh_topk,
    project_pca,
    query_ivfpq_index,
    train_pca,
)
from cae_polars_tools_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="cae-polars-tools-spark-ann")
    spark.sparkContext.setLogLevel("ERROR")

    e = spread(read_table(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") < 10)

    exact = bruteforce_topk(e, q)
    exact_set = {
        (r["query_id"], r["neighbor_id"]) for r in exact.collect()
    }
    print(f"brute force: {len(exact_set)} (query, neighbor) pairs")

    def recall(df) -> float:
        got = {(r["query_id"], r["neighbor_id"]) for r in df.collect()}
        return len(exact_set & got) / len(exact_set)

    print(f"LSH single-probe recall@5: {recall(lsh_topk(e, q)):.2f}")
    print(
        "LSH multi-probe (nprobe=4) recall@5: "
        f"{recall(lsh_topk(e, q, nprobe=4)):.2f}"
    )
    print(
        "IVF (parity quantizer) recall@5: "
        f"{recall(ivf_topk(e, q, parity=True)):.2f}"
    )
    print(
        "IVF-PQ + exact re-rank recall@5: "
        f"{recall(ivfpq_topk(e, q)):.2f}"
    )
    print(
        "IVF-PQ raw ADC recall@5 (quantization-limited): "
        f"{recall(ivfpq_topk(e, q, rerank=None)):.2f}"
    )

    # Persisted index: build once (quantizers + partition-per-cell
    # codes table on disk), then answer queries reading ONLY the
    # probed partitions — bit-equal to the inline cascade above.
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        idx = os.path.join(tmp, "ivfpq")
        spark = e.sparkSession
        # lifecycle: build on part of the corpus, append the rest
        # under the frozen model, query, CoW-delete a few ids,
        # compact the segment buildup — the full production loop
        base = e.filter(F.col("vec_id") % 2 == 0)
        rest = e.filter(F.col("vec_id") % 2 == 1)
        build_ivfpq_index(base, idx)
        appended = append_ivfpq_index(spark, idx, rest)
        print(f"index: appended {appended['rows_appended']} vectors")
        from_index = query_ivfpq_index(
            spark, idx, q, rerank=PQ_RERANK, embeddings=e
        )
        print(
            "persisted-index recall@5 (== inline): "
            f"{recall(from_index):.2f}"
        )
        stats = delete_ivfpq_index(spark, idx, "vec_id IN (501, 503)")
        print(
            f"index: CoW delete removed {stats['rows_deleted']} rows "
            f"-> {stats['codes_dir']}"
        )
        c = compact_ivfpq_index(spark, idx)
        print(f"index: compacted to {c['files']} files ({c['codes_dir']})")

    model = train_pca(e, PCA_K)
    var = model["explained_variance"]
    projected = project_pca(e, model)
    n = projected.count()
    print(
        f"PCA: projected {n} vectors to {PCA_K} dims "
        f"(top component variance {var[0]:.4f})"
    )
    print("ANN demo complete.")


if __name__ == "__main__":
    main()

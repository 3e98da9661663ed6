"""Semantic tests for the training-data pipeline operators — the
properties the SQL oracle can't express (LSH recall, simhash metric
behavior, decoder seam)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _docs(spark):
    data = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2, "the quick brown fox jumps over the lazy dog near the river bend"),  # near-dup of 1
        (3, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 1
        (4, "completely different content about spark query engines and data"),
        (5, "totally unrelated words forming another document for testing here"),
    ]
    return spark.createDataFrame(data, ["doc_id", "text"])


def test_exact_dedup_groups_exact_copies(spark):
    from cae_polars_tools_spark.operators.text import fingerprint

    d = _docs(spark).select("doc_id", fingerprint("text").alias("fp"))
    groups = d.groupBy("fp").agg(
        F.min("doc_id").alias("canon"), F.count(F.lit(1)).alias("n")
    )
    rows = {r["canon"]: r["n"] for r in groups.collect()}
    assert rows[1] == 2  # docs 1 and 3 collapse
    assert rows[2] == 1 and rows[4] == 1 and rows[5] == 1


def test_jaccard_pairs_finds_near_dup(spark):
    from cae_polars_tools_spark.operators.dedup import jaccard_pairs

    pairs = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in jaccard_pairs(_docs(spark), threshold=0.5).collect()
    }
    assert pairs[(1, 3)] == 1.0  # exact dup
    assert 0.5 <= pairs[(1, 2)] < 1.0  # near dup
    assert (1, 4) not in pairs


def test_minhash_lsh_matches_exact_join(spark, sf_small):
    """LSH (candidates + exact verify) ≡ exact similarity join on the
    synthetic corpus — recall check for the banding parameters."""
    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.operators.dedup import (
        jaccard_pairs,
        minhash_lsh_pairs,
    )

    docs = read_table(spark, sf_small, "documents")
    exact = {
        (r["doc_id_a"], r["doc_id_b"]) for r in jaccard_pairs(docs).collect()
    }
    lsh = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in minhash_lsh_pairs(docs).collect()
    }
    assert lsh == exact
    assert len(exact) > 0  # the corpus contains planted near-dups


def test_simhash_properties(spark):
    from cae_polars_tools_spark.operators.dedup import (
        simhash_pairs,
        simhash_signatures,
    )

    sigs = {
        r["doc_id"]: r["simhash"]
        for r in simhash_signatures(_docs(spark)).collect()
    }
    assert sigs[1] == sigs[3]  # identical docs → identical signature
    ham12 = bin((sigs[1] ^ sigs[2]) & (2**64 - 1)).count("1")
    ham14 = bin((sigs[1] ^ sigs[4]) & (2**64 - 1)).count("1")
    assert ham12 < ham14  # near-dup closer than unrelated
    pairs = {
        (r["doc_id_a"], r["doc_id_b"]): r["hamming"]
        for r in simhash_pairs(_docs(spark), max_hamming=8).collect()
    }
    assert pairs[(1, 3)] == 0


def test_ann_lsh_recall_vs_bruteforce(spark, sf_small):
    """Bucketed ANN recall@5 against exact brute force — documents the
    speed/recall trade; bound asserted loosely (single-probe LSH)."""
    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.operators.similarity import (
        bruteforce_topk,
        lsh_topk,
    )

    e = read_table(spark, sf_small, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in bruteforce_topk(e, q).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"]) for r in lsh_topk(e, q).collect()
    }
    assert len(exact) == 50  # 10 queries × 5
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2  # 8-table OR-amplified LSH on random 64-d vectors


def test_collect_queries_guard_raises_on_oversized_set(spark, sf_small):
    """The broadcast-regime contract is enforced: a query set past the
    cap raises instead of silently materializing on the driver, and
    the bounded collect pulls at most cap+1 rows first."""
    import pytest

    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.operators.similarity import (
        _collect_queries,
        bruteforce_topk,
    )

    e = read_table(spark, sf_small, "embeddings")
    with pytest.raises(ValueError, match="broadcast regime"):
        _collect_queries(e, max_queries=10)
    # at-the-cap sets still collect fine
    qids, Q, _ = _collect_queries(e.filter(F.col("vec_id") < 10), max_queries=10)
    assert len(qids) == 10 and Q.shape[0] == 10
    # and the end-to-end operator surfaces the same guard (the sf0.001
    # table is small, so build an over-cap query frame synthetically)
    big_q = spark.range(70000).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="broadcast regime"):
        bruteforce_topk(e, big_q).collect()


def test_ann_lsh_multiprobe_buys_recall_query_side_only(spark, sf_small):
    """Multi-probe (flip the lowest-|margin| sign bits per table)
    must (a) be a candidate SUPERSET of single-probe — the base
    bucket is always probed — and (b) raise recall vs brute force
    monotonically enough to beat single-probe at nprobe=4, all
    WITHOUT touching the corpus-side index."""
    import pytest

    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.operators.similarity import (
        bruteforce_topk,
        lsh_topk,
    )

    e = read_table(spark, sf_small, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in bruteforce_topk(e, q).collect()
    }

    def hits(nprobe):
        return {
            (r["query_id"], r["neighbor_id"])
            for r in lsh_topk(e, q, nprobe=nprobe).collect()
        }

    single = hits(1)
    multi = hits(4)
    r1 = len(exact & single) / len(exact)
    r4 = len(exact & multi) / len(exact)
    assert r4 >= r1  # never worse: candidates are a superset
    assert r4 > r1  # and on this corpus strictly better
    assert r4 >= 0.5
    # deterministic: same probes, same result
    assert hits(4) == multi
    with pytest.raises(ValueError, match="nprobe"):
        lsh_topk(e, q, nprobe=0)
    with pytest.raises(ValueError, match="nprobe"):
        lsh_topk(e, q, nprobe=99)


def test_multimodal_decoder_seam(spark):
    """Custom decode_fn flows through; default stub for real media
    raises NotImplementedError."""
    from cae_polars_tools_spark.operators.multimodal import (
        decode_image,
        extract_features,
        with_payload,
    )

    assets = with_payload(_docs(spark))
    feats = extract_features(
        assets, decode_fn=lambda b: {"n_bytes": len(b) * 2, "first_byte": 7}
    ).collect()
    assert all(r["first_byte"] == 7 for r in feats)
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_multimodal_payload_schema(spark):
    from cae_polars_tools_spark.operators.multimodal import with_payload

    assets = with_payload(_docs(spark))
    assert dict(assets.dtypes)["payload"] == "binary"
    assert "struct<modality:string,mime:string,n_bytes:bigint>" == dict(assets.dtypes)["meta"]
    row = assets.filter(F.col("doc_id") == 1).collect()[0]
    assert row["meta"]["n_bytes"] == len(row["payload"])


def test_parity_quantizer_bitwise_matches_duckdb(spark, sf_small):
    """The cross-engine contract behind the ann_ivf_topk /
    dedup_semantic oracles, pinned at its strongest point: the numpy
    trainer and the unrolled-Lloyd DuckDB CTEs must produce
    BIT-IDENTICAL centroid matrices and identical per-row cluster
    assignments (not merely matching entry output)."""
    import duckdb
    import numpy as np

    from cae_polars_tools_spark.io import read_table, spread
    from cae_polars_tools_spark.operators.similarity import (
        assign_udf_parity,
        kmeans_parity_ctes,
        train_kmeans_parity,
    )

    e = spread(read_table(spark, sf_small, "embeddings"))
    C = train_kmeans_parity(e, n_centroids=8, n_iters=8)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_small}/embeddings.parquet')"
    )
    ctes = kmeans_parity_ctes(8, 8)
    rows = con.execute(
        f"WITH {ctes} SELECT cl, c FROM km_cent ORDER BY cl"
    ).fetchall()
    C_sql = np.array([r[1] for r in rows])
    assert np.array_equal(C, C_sql)  # bitwise, no tolerance
    a_spark = {
        r["vec_id"]: r["cl"]
        for r in e.select(
            "vec_id", assign_udf_parity(C)(F.col("embedding")).alias("cl")
        ).collect()
    }
    a_sql = dict(
        con.execute(f"WITH {ctes} SELECT vec_id, cl FROM km_assign").fetchall()
    )
    assert a_spark == a_sql


def test_parity_quantizer_raises_on_tiny_corpus(spark):
    """Fewer even-id rows than centroids is a hard error, not a
    silently degenerate quantizer."""
    import pytest

    from cae_polars_tools_spark.operators.similarity import (
        train_kmeans_parity,
    )

    six = spark.range(6).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("embedding"),
    )  # only 3 even ids
    with pytest.raises(ValueError, match="even-id rows"):
        train_kmeans_parity(six, n_centroids=8)


def test_pq_codebooks_bitwise_match_duckdb(spark, sf_small):
    """The PQ half of the ann_ivfpq_topk oracle, pinned at its
    strongest point: per-subspace codebooks from the numpy parity
    Lloyd and the unrolled SQL CTEs are BIT-IDENTICAL, and every
    corpus row's code vector matches."""
    import duckdb
    import numpy as np

    from cae_polars_tools_spark.io import read_table, spread
    from cae_polars_tools_spark.operators.similarity import (
        PQ_CODEWORDS,
        PQ_SUBSPACES,
        pq_encode_udf,
        pq_parity_ctes,
        train_pq_parity,
    )

    e = spread(read_table(spark, sf_small, "embeddings"))
    C = train_pq_parity(e)
    assert C.shape == (PQ_SUBSPACES, PQ_CODEWORDS, 64 // PQ_SUBSPACES)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_small}/embeddings.parquet')"
    )
    ctes = pq_parity_ctes()
    rows = con.execute(
        f"WITH {ctes} SELECT j, cl, c FROM pq_cent ORDER BY j, cl"
    ).fetchall()
    C_sql = np.array([r[2] for r in rows]).reshape(C.shape)
    assert np.array_equal(C, C_sql)  # bitwise, no tolerance
    codes_spark = {
        r["vec_id"]: list(r["codes"])
        for r in e.select(
            "vec_id", pq_encode_udf(C)(F.col("embedding")).alias("codes")
        ).collect()
    }
    codes_sql: dict = {}
    for vec_id, j, cl in con.execute(
        f"WITH {ctes} SELECT vec_id, j, cl FROM pq_codes ORDER BY vec_id, j"
    ).fetchall():
        codes_sql.setdefault(vec_id, []).append(cl)
    assert codes_spark == codes_sql


def test_ann_ivfpq_rerank_recovers_recall(spark, sf_small):
    """The production cascade: raw ADC ranking is quantization-limited
    on the near-isotropic demo vectors (its hardest case), and the
    exact-cosine re-rank of the ADC survivors must recover most of the
    IVF routing's recall. Also pins determinism across rebuilds."""
    from cae_polars_tools_spark.io import read_table, spread
    from cae_polars_tools_spark.operators.similarity import (
        bruteforce_topk,
        ivfpq_topk,
    )

    e = spread(read_table(spark, sf_small, "embeddings"))
    q = e.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in bruteforce_topk(e, q).collect()
    }
    adc_only = {
        (r["query_id"], r["neighbor_id"])
        for r in ivfpq_topk(e, q, rerank=None).collect()
    }
    reranked = [
        (r["query_id"], r["neighbor_id"], r["rank"], r["cosine"])
        for r in ivfpq_topk(e, q).collect()
    ]
    rr_pairs = {(a, b) for a, b, *_ in reranked}
    assert len(rr_pairs) == 50  # 10 queries × 5
    recall_adc = len(exact & adc_only) / len(exact)
    recall_rr = len(exact & rr_pairs) / len(exact)
    assert recall_adc >= 0.1
    assert recall_rr >= 0.5  # measured 0.78; IVF routing ceiling 0.88
    assert recall_rr > recall_adc  # the re-rank must actually help
    # deterministic: a full rebuild returns the identical ranking
    again = [
        (r["query_id"], r["neighbor_id"], r["rank"], r["cosine"])
        for r in ivfpq_topk(e, q).collect()
    ]
    assert sorted(reranked) == sorted(again)


def test_ann_ivf_recall_vs_bruteforce(spark, sf_small):
    """IVF ANN recall@5 against exact brute force. With nprobe=6 of 16
    lists each query scans ~3/8 of the corpus; on near-orthogonal
    random vectors the cluster structure is weak, so the floor is
    loose — the assertion documents the trade, not a tuning target."""
    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.operators.similarity import (
        bruteforce_topk,
        ivf_topk,
    )

    e = read_table(spark, sf_small, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in bruteforce_topk(e, q).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"]) for r in ivf_topk(e, q).collect()
    }
    assert len(exact) == 50
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2


def test_bucket_pairs_max_bucket_guard(spark):
    """With max_bucket set, an oversized equality bucket fails loudly
    (the documented alternative to a single-task OOM on duplicate-
    heavy corpora) while compliant buckets pass through."""
    from pyspark.errors import SparkRuntimeException

    from cae_polars_tools_spark.operators.dedup import bucket_pairs

    rows = [(i, "hot") for i in range(10)] + [(100, "cold"), (101, "cold")]
    idx = spark.createDataFrame(rows, "doc_id long, g string")
    ok = bucket_pairs(idx, ["g"], max_bucket=64).collect()
    assert len(ok) == 45 + 1  # C(10,2) hot + 1 cold pair
    with pytest.raises(SparkRuntimeException, match="max_bucket=4"):
        bucket_pairs(idx, ["g"], max_bucket=4).collect()


def test_minhash_band_hashes_consistent_with_signature(spark):
    """The fused band-hash UDF must equal the row-combine of the plain
    signature UDF — guards the fusion against drift in either path."""
    import numpy as np

    from cae_polars_tools_spark.operators.dedup import (
        LSH_BANDS,
        LSH_ROWS,
        _band_coef,
        hashed_shingles,
        minhash_band_hashes,
        minhash_signature,
    )

    docs = _docs(spark).select(
        "doc_id", hashed_shingles("text").alias("h64")
    )
    both = docs.select(
        "doc_id",
        minhash_signature("h64").alias("sig"),
        minhash_band_hashes("h64").alias("bh"),
    ).collect()
    c = _band_coef()
    assert both
    for r in both:
        sig = np.asarray(r["sig"], dtype=np.int64).view(np.uint64)
        want = (sig.reshape(LSH_BANDS, LSH_ROWS) * c[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        assert list(want.astype(np.int64)) == list(r["bh"])


def test_minhash_lsh_wires_max_bucket_to_band_buckets(spark):
    """The LSH call site passes its OOM guard down to bucket_pairs: a
    pile of identical docs (one giant band bucket) fails loudly at a
    tiny cap, and the default cap leaves a normal corpus untouched."""
    from pyspark.errors import SparkRuntimeException

    from cae_polars_tools_spark.operators.dedup import minhash_lsh_pairs

    clones = spark.createDataFrame(
        [(i, "the same exact document body repeated verbatim " * 8)
         for i in range(12)],
        "doc_id long, text string",
    )
    with pytest.raises(SparkRuntimeException, match="max_bucket=4"):
        minhash_lsh_pairs(clones, max_bucket=4).collect()
    assert len(minhash_lsh_pairs(clones).collect()) == 66  # C(12,2)


def test_ivf_sample_bias_dial(spark, sf_oracle):
    """The training sample comes from the first-scanned partitions
    (sample+limit, no full-corpus pass), so a corpus whose shard order
    correlates with content is the worst case for quantizer quality.
    The documented dial: a smaller ``sample_fraction`` widens the
    scanned span. Assert a deliberately label-range-sharded corpus
    still trains centroids good enough to hold the recall floor."""
    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.operators.similarity import (
        IVF_CENTROIDS,
        bruteforce_topk,
        ivf_topk,
        train_ivf_centroids,
    )

    e = read_table(spark, sf_oracle, "embeddings")
    # Shard-ordered corpus: partitions are label ranges, so a prefix
    # scan sees only a few labels' worth of content.
    sharded = e.repartitionByRange(8, "label").sortWithinPartitions("label")
    # The thinned sample must still cover >= n_centroids rows.
    c = train_ivf_centroids(sharded, sample_fraction=0.1)
    assert c.shape == (IVF_CENTROIDS, 64)

    q = e.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in bruteforce_topk(e, q).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(sharded, q, sample_fraction=0.1).collect()
    }
    assert len(exact) == 50
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2  # same floor as the unsharded recall test


def test_ivf_centroids_shape_and_determinism(spark, sf_small):
    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.operators.similarity import (
        IVF_CENTROIDS,
        train_ivf_centroids,
    )

    e = read_table(spark, sf_small, "embeddings")
    c1 = train_ivf_centroids(e)
    c2 = train_ivf_centroids(e)
    assert c1.shape == (IVF_CENTROIDS, 64)
    import numpy as np

    np.testing.assert_allclose(c1, c2, rtol=1e-12)


def test_resize_assets_deterministic_thumbnail(spark):
    from cae_polars_tools_spark.operators.multimodal import (
        RESIZE_H,
        RESIZE_W,
        resize_assets,
        resize_image,
        with_payload,
    )

    out = resize_assets(with_payload(_docs(spark))).collect()
    assert all(len(r["payload"]) == RESIZE_W * RESIZE_H for r in out)
    assert all(r["width"] == RESIZE_W and r["height"] == RESIZE_H for r in out)
    with pytest.raises(NotImplementedError):
        resize_image(b"\x89PNG", 8, 8)


def test_sample_frames_fanout_and_bytes(spark):
    from cae_polars_tools_spark.operators.multimodal import (
        FRAME_BYTES,
        FRAME_STEP,
        sample_frames,
        with_payload,
    )

    docs = _docs(spark)
    out = sample_frames(with_payload(docs)).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in out:
        assert r["frame_idx"] % FRAME_STEP == 0
        start = r["frame_idx"] * FRAME_BYTES
        expect = texts[r["doc_id"]].encode()[start : start + FRAME_BYTES]
        assert bytes(r["frame"]) == expect


def test_asof_join_semantics(spark):
    """Backward as-of: greatest right ts <= left ts per key; equal ts
    matches; no prior right row => nulls; right attrs carried by name."""
    from cae_polars_tools_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "u1", 10), (2, "u1", 25), (3, "u1", 5), (4, "u2", 50)],
        "event_id long, user_id string, ts_us long",
    )
    right = spark.createDataFrame(
        [("u1", 10, 100.0), ("u1", 20, 200.0), ("u3", 1, 999.0)],
        "user_id string, ts_us long, feat double",
    )
    rows = {
        r["event_id"]: r
        for r in asof_join(left, right, on="ts_us", by="user_id").collect()
    }
    assert rows[1]["matched_ts_us"] == 10 and rows[1]["feat"] == 100.0  # tie
    assert rows[2]["matched_ts_us"] == 20 and rows[2]["feat"] == 200.0
    assert rows[3]["matched_ts_us"] is None and rows[3]["feat"] is None
    assert rows[4]["matched_ts_us"] is None  # key with no right rows
    assert len(rows) == 4  # left join: every left row exactly once

def test_shingles_short_documents(spark):
    """Docs with fewer than NGRAM tokens yield EMPTY shingle sets and
    never crash: Spark's sequence(1, 0) auto-descends to [1, 0]
    (unlike DuckDB generate_series) and index 0 would blow up slice."""
    from cae_polars_tools_spark.operators.dedup import (
        hashed_shingles,
        jaccard_pairs,
        minhash_lsh_pairs,
        shingles,
    )

    docs = spark.createDataFrame(
        [
            (1, "tiny"),
            (2, "just two"),
            (3, ""),
            (4, "exactly five tokens right here"),
            (5, "the quick brown fox jumps over the lazy dog near the river bank"),
            (6, "the quick brown fox jumps over the lazy dog near the river bend"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id",
            shingles("text").alias("s"),
            hashed_shingles("text").alias("h"),
        ).collect()
    }
    for short_id in (1, 2, 3):
        assert rows[short_id]["s"] == [] and rows[short_id]["h"] == []
    assert len(rows[4]["s"]) == 1
    # End-to-end: both dedup paths must run on a corpus with short docs
    # (pre-guard they raised INVALID_PARAMETER_VALUE.START at runtime).
    exact = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in jaccard_pairs(docs, threshold=0.5).collect()
    }
    lsh = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    assert (5, 6) in exact and (5, 6) in lsh


def test_connected_components_semantics(spark):
    """Path graphs converge end-to-end, disjoint components keep
    separate canonical labels, singletons absent from any pair never
    appear — and BOTH physical strategies (single-task union-find and
    the distributed min-label loop, forced via local_threshold=0)
    agree."""
    from cae_polars_tools_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        # component {1,2,3,4} as a path; component {10, 11}; 99 isolated
        [(2, 3), (1, 2), (3, 4), (10, 11)],
        ["doc_id_a", "doc_id_b"],
    )
    want = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    for threshold in (5_000_000, 0):
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in connected_components(
                pairs, local_threshold=threshold
            ).collect()
        }
        assert got == want, f"local_threshold={threshold}"


def test_connected_components_pointer_jumping_beats_diameter(spark):
    """A 120-vertex path graph (diameter 119) must converge in the
    distributed loop well under diameter-many rounds — pointer
    jumping gives O(log d). max_iters=12 would leave plain one-hop
    propagation ~90% unconverged (and warning); the jump must finish
    cleanly and exactly."""
    import warnings

    from cae_polars_tools_spark.operators.dedup import connected_components

    n = 120
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["doc_id_a", "doc_id_b"]
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # non-convergence warns → fail
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in connected_components(
                pairs, local_threshold=0, max_iters=12
            ).collect()
        }
    assert got == {i: 0 for i in range(n)}


def test_connected_components_one_action_per_round(spark, monkeypatch):
    """The distributed loop must submit exactly ONE driver action per
    propagation round — the convergence count that also materializes
    the round's lazy localCheckpoint — plus the single up-front pair
    count. A second per-round action (e.g. an eager checkpoint, or a
    separate materialize-then-count) would double the driver
    round-trips and show up here immediately."""
    from cae_polars_tools_spark.operators.dedup import connected_components

    n = 120  # diameter 119; pointer jumping converges in <= 12 rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["doc_id_a", "doc_id_b"]
    )
    # patch the CONCRETE class (pyspark 4's classic DataFrame overrides
    # the base methods, so patching pyspark.sql.DataFrame is a no-op)
    cls = type(pairs)
    calls = {"count": 0, "collect": 0}
    orig_count, orig_collect = cls.count, cls.collect

    def counting_count(self):
        calls["count"] += 1
        return orig_count(self)

    def counting_collect(self):
        calls["collect"] += 1
        return orig_collect(self)

    monkeypatch.setattr(cls, "count", counting_count)
    monkeypatch.setattr(cls, "collect", counting_collect)
    out = connected_components(pairs, local_threshold=0)
    in_loop = dict(calls)
    assert out.count() - 1 == n - 1  # correctness guard (one cluster)
    # 1 pair count + <=12 convergence counts; no collects at all
    assert in_loop["collect"] == 0
    assert 2 <= in_loop["count"] <= 13, in_loop


def test_connected_components_releases_checkpoint_blocks(spark):
    """DataFrame.unpersist does not release localCheckpoint RDD
    blocks; the loop must release each finished round's blocks
    eagerly and the finalizer must release the final frame's — no
    executor storage may accumulate across calls."""
    import gc

    from cae_polars_tools_spark.operators.dedup import connected_components

    jsc = spark.sparkContext._jsc.sc()

    def stored_ids():
        return {info.id() for info in jsc.getRDDStorageInfo()}

    before = stored_ids()
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], ["doc_id_a", "doc_id_b"]
    )
    out = connected_components(pairs, local_threshold=0)
    out.count()
    # while the handle is live only the FINAL round's frame may hold
    # blocks (cache entry + its checkpoint RDD) — per-round frames are
    # released inside the loop
    live = stored_ids() - before
    assert len(live) <= 2, f"per-round blocks leaked: {live}"
    del out
    gc.collect()
    assert stored_ids() - before == set()


def test_jaccard_df_cap_drops_hot_shingles(spark):
    """With a deliberately hot shingle (one phrase shared by every
    doc), a tight DF cap removes it from candidate generation: docs
    related ONLY through the hot phrase stop pairing, while true
    near-dups (sharing rare shingles too) keep their EXACT jaccard —
    verification runs over the full, uncapped sets."""
    from cae_polars_tools_spark.operators.dedup import jaccard_pairs

    boiler = "this common header appears on every single document"
    data = [
        (1, f"{boiler} alpha beta gamma delta epsilon zeta eta theta"),
        (2, f"{boiler} alpha beta gamma delta epsilon zeta eta iota"),
        (3, f"{boiler} completely different tail content here now ok"),
        (4, f"{boiler} another unrelated ending with other words too"),
    ]
    docs = spark.createDataFrame(data, ["doc_id", "text"])

    uncapped = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in jaccard_pairs(docs, threshold=0.2, max_df=10).collect()
    }
    capped = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in jaccard_pairs(docs, threshold=0.2, max_df=3).collect()
    }
    # Uncapped: every pair shares the boilerplate shingles.
    assert (3, 4) in uncapped
    # Capped at 3 (< 4 docs): boilerplate-only relations disappear ...
    assert (3, 4) not in capped
    # ... but the true near-dup pair survives with its EXACT jaccard
    # (identical to the uncapped value — verification is uncapped).
    assert capped[(1, 2)] == uncapped[(1, 2)]


def test_asof_join_preserves_null_right_attributes(spark):
    """A genuinely-NULL attribute in the matched right row must come
    through as NULL — not be back-filled from an older right row."""
    from cae_polars_tools_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "u1", 30)], "event_id long, user_id string, ts_us long"
    )
    right = spark.createDataFrame(
        [("u1", 10, 100.0), ("u1", 20, None)],
        "user_id string, ts_us long, feat double",
    )
    (row,) = asof_join(left, right, on="ts_us", by="user_id").collect()
    assert row["matched_ts_us"] == 20
    assert row["feat"] is None  # matched row's NULL, not 100.0 carried


def test_range_join_semantics(spark):
    """Banded range join == naive BETWEEN join, including band-boundary
    crossings and the window's closed endpoints."""
    from cae_polars_tools_spark.operators.temporal import range_join

    W = 100
    left = spark.createDataFrame(
        [(1, "u1", 95), (2, "u1", 200), (3, "u2", 10)],
        "lid long, user_id string, ts_us long",
    )
    right = spark.createDataFrame(
        # 95: equal start; 105: crosses into the next band; 195: exact
        # window end for lid=1; 196: just outside; u2@111 outside [10,110]
        [(10, "u1", 95), (11, "u1", 105), (12, "u1", 195), (13, "u1", 196),
         (14, "u2", 111)],
        "rid long, user_id string, ts_us long",
    )
    out = range_join(left, right, on="ts_us", by="user_id", window=W)
    got = {(r["lid"], r["rid"]) for r in out.collect()}
    assert got == {(1, 10), (1, 11), (1, 12)}
    # matched right timestamp surfaces for gap computation
    gaps = {(r["lid"], r["rid"]): r["matched_ts_us"] - r["ts_us"] for r in out.collect()}
    assert gaps[(1, 12)] == 100 and gaps[(1, 10)] == 0


def test_salted_agg_equals_plain_agg(spark):
    """Two-phase salted aggregation is algebraically identical to the
    plain groupBy — on data where one key holds ~90% of all rows (the
    scenario the operator exists for)."""
    from cae_polars_tools_spark.operators.skew import salted_agg

    rows = [("hot", float(i % 7), i) for i in range(900)]
    rows += [(f"k{i % 5}", float(i), i) for i in range(100)]
    df = spark.createDataFrame(rows, "key string, x double, n long")
    got = {
        r["key"]: (r["total"], r["cnt"], r["lo"], r["hi"], r["mean"])
        for r in salted_agg(
            df,
            ["key"],
            {
                "total": ("x", "sum"),
                "cnt": ("n", "count"),
                "lo": ("x", "min"),
                "hi": ("x", "max"),
                "mean": ("x", "avg"),
            },
            salt_buckets=8,
        ).collect()
    }
    want = {
        r["key"]: (r["total"], r["cnt"], r["lo"], r["hi"], r["mean"])
        for r in df.groupBy("key")
        .agg(
            F.sum("x").alias("total"),
            F.count("n").alias("cnt"),
            F.min("x").alias("lo"),
            F.max("x").alias("hi"),
            F.avg("x").alias("mean"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][:4] == want[k][:4], k
        assert abs(got[k][4] - want[k][4]) < 1e-9, k


def test_salted_agg_spreads_hot_key(spark):
    """Phase 1 really fans the hot key out: its rows land in multiple
    (key, salt) groups, and the salt is deterministic per row (retry /
    speculation safe), so two runs agree bucket-for-bucket."""
    from cae_polars_tools_spark.operators.skew import salted_agg

    df = spark.createDataFrame(
        [("hot", float(i)) for i in range(200)], "key string, x double"
    )
    from pyspark.sql import functions as SF

    salted = df.withColumn(
        "__salt", SF.pmod(SF.hash("x", SF.lit(42)), SF.lit(8))
    )
    buckets1 = sorted(
        r["__salt"] for r in salted.select("__salt").distinct().collect()
    )
    buckets2 = sorted(
        r["__salt"] for r in salted.select("__salt").distinct().collect()
    )
    assert len(buckets1) > 1  # hot key spread over several reducers
    assert buckets1 == buckets2  # deterministic
    # and the merged result is still exact
    (row,) = salted_agg(
        df, ["key"], {"total": ("x", "sum")}, salt_buckets=8
    ).collect()
    assert row["total"] == sum(float(i) for i in range(200))


def test_salted_agg_rejects_non_algebraic(spark):
    from cae_polars_tools_spark.operators.skew import salted_agg

    df = spark.createDataFrame([("a", 1.0)], "key string, x double")
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_agg(df, ["key"], {"p50": ("x", "median")})


def _skew_join_frames(spark):
    # hot key 'h' holds 90% of big rows; one big key ('miss') and one
    # small key ('orphan') are unmatched, exercising the outer paths
    big = spark.createDataFrame(
        [("h", i) for i in range(450)]
        + [(f"k{i % 4}", i) for i in range(40)]
        + [("miss", 0)],
        "key string, v long",
    )
    small = spark.createDataFrame(
        [("h", "hot-dim"), ("k0", "d0"), ("k1", "d1"), ("orphan", "dx")],
        "key string, attr string",
    )
    return big, small


@pytest.mark.parametrize(
    "how", ["inner", "left", "left_semi", "left_anti", "semi", "anti"]
)
def test_salted_join_equals_plain_join(spark, how):
    """The salted rewrite is exactly the plain join for every
    big-side-preserving join type — including unmatched rows on BOTH
    sides and a 90%-hot key."""
    from cae_polars_tools_spark.operators.skew import salted_join

    big, small = _skew_join_frames(spark)
    from collections import Counter

    got = salted_join(big, small, ["key"], salt_buckets=8, how=how)
    want = big.join(small, ["key"], how)
    assert sorted(got.columns) == sorted(want.columns)
    cols = sorted(got.columns)
    # Counter, not sorted(): left-join rows carry None attrs, which
    # Python's tuple ordering cannot compare against strings
    assert Counter(map(tuple, got.select(*cols).collect())) == Counter(
        map(tuple, want.select(*cols).collect())
    )


def test_salted_join_spreads_hot_key_and_is_deterministic(spark):
    """The hot key's rows really fan out over several salt buckets,
    identically across runs (retry/speculation safety)."""
    from pyspark.sql import functions as SF

    big, small = _skew_join_frames(spark)
    salted = big.withColumn(
        "__salt",
        SF.pmod(SF.xxhash64("key", "v", SF.lit(42)), SF.lit(8)),
    ).where(SF.col("key") == "h")
    b1 = sorted(r["__salt"] for r in salted.select("__salt").distinct().collect())
    b2 = sorted(r["__salt"] for r in salted.select("__salt").distinct().collect())
    assert len(b1) > 1 and b1 == b2


def test_salted_join_rejects_small_side_preserving_types(spark):
    from cae_polars_tools_spark.operators.skew import salted_join

    big, small = _skew_join_frames(spark)
    for how in ("right", "full", "outer", "cross"):
        with pytest.raises(ValueError, match="not big-side-preserving"):
            salted_join(big, small, ["key"], how=how)
    with pytest.raises(ValueError, match="absent"):
        salted_join(big, small.drop("key"), ["key"])
    with pytest.raises(ValueError, match="salt_cols"):
        salted_join(big, small, ["key"], salt_cols=["nope"])


def test_salted_join_salt_cols_and_map_columns(spark):
    """An explicit salt_cols spreads a hot key even when every other
    column is constant (verbatim-duplicate rows), and a MapType
    column is excluded from the default salt instead of crashing
    xxhash64."""
    from collections import Counter

    from pyspark.sql import functions as SF

    from cae_polars_tools_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        [(i, "hot", "same") for i in range(100)],
        "row_id long, key string, payload string",
    ).withColumn("m", SF.create_map(SF.lit("k"), SF.col("payload")))
    small = spark.createDataFrame([("hot", "d")], "key string, attr string")

    # default salt skips the map column and still works
    got = salted_join(big, small, ["key"], salt_buckets=8)
    assert got.count() == 100
    # duplicate rows across salt cols → one salt; a unique id spreads
    salts_dup = big.withColumn(
        "__salt",
        SF.pmod(SF.xxhash64("key", "payload", SF.lit(42)), SF.lit(8)),
    )
    assert salts_dup.select("__salt").distinct().count() == 1
    got_id = salted_join(
        big, small, ["key"], salt_buckets=8, salt_cols=["row_id"]
    )
    assert Counter(r["key"] for r in got_id.collect()) == {"hot": 100}


def test_embedding_lsh_pairs_precision_and_recall(spark, sf_small):
    """Keyless LSH near-dup path: every emitted pair must exist in the
    exact all-pairs ground truth WITH the identical cosine (verification
    is exact, so precision is 1 by construction), and the
    seed-deterministic recall must hold its measured floor — overall
    recall is the documented sign-LSH weak spot at a 0.40 threshold
    (~0.39 here), while the strongest (top-decile) pairs are caught at
    ~0.83."""
    import numpy as np

    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.operators.dedup import (
        COSINE_DEDUP_THRESHOLD,
        _tiled_cosine_pairs,
        embedding_lsh_pairs,
    )

    e = read_table(spark, sf_small, "embeddings")
    lsh = embedding_lsh_pairs(e).toPandas()

    pdf = e.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy().astype(np.int64)
    E = np.stack(pdf["embedding"].to_numpy())
    exact = _tiled_cosine_pairs(ids, E, COSINE_DEDUP_THRESHOLD)
    assert len(exact) > 0

    ex = {
        (a, b): c
        for a, b, c in zip(exact.vec_id_a, exact.vec_id_b, exact.raw_cos)
    }
    got = {
        (a, b): c for a, b, c in zip(lsh.vec_id_a, lsh.vec_id_b, lsh.cosine)
    }
    # precision: subset with bit-identical (rounded) cosines
    for pair, c in got.items():
        assert pair in ex, f"LSH emitted a pair not in ground truth: {pair}"
        assert round(ex[pair], 6) == c
    # no duplicate pair rows survive the multi-table distinct
    assert len(lsh) == len(got)

    recall = len(set(got) & set(ex)) / len(ex)
    assert recall >= 0.30, f"overall recall regressed: {recall:.3f}"
    top = exact.sort_values("raw_cos", ascending=False).head(
        max(len(exact) // 10, 1)
    )
    tops = set(zip(top.vec_id_a, top.vec_id_b))
    top_recall = len(tops & set(got)) / len(tops)
    assert top_recall >= 0.60, f"top-decile recall regressed: {top_recall:.3f}"


def test_tiled_cosine_pairs_tile_invariance():
    """The tiled kernel must emit identical pairs/doubles for any tile
    size (the 'block-independent doubles' contract the multi-bucket
    distinct relies on)."""
    import numpy as np

    from cae_polars_tools_spark.operators.dedup import _tiled_cosine_pairs

    rng = np.random.default_rng(7)
    E = rng.standard_normal((97, 64)).astype(np.float32)
    ids = rng.permutation(97).astype(np.int64)
    a = _tiled_cosine_pairs(ids, E, 0.1, tile_rows=2048)
    b = _tiled_cosine_pairs(ids, E, 0.1, tile_rows=7)
    pa = list(zip(a.vec_id_a, a.vec_id_b, a.raw_cos))
    pb = list(zip(b.vec_id_a, b.vec_id_b, b.raw_cos))
    assert sorted(pa) == sorted(pb)
    assert len(pa) > 0


def test_ann_empty_query_set(spark):
    """A filter that matches no queries is a valid input at scale —
    every ANN path must return a typed empty frame, not crash on
    np.stack of zero arrays."""
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        LongType,
        StructField,
        StructType,
    )

    from cae_polars_tools_spark.operators.similarity import (
        bruteforce_topk,
        lsh_topk,
    )

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    emb = spark.createDataFrame(
        [(i, [float(i + 1)] * 64) for i in range(20)], schema
    )
    no_queries = emb.filter("vec_id < 0")
    for fn in (bruteforce_topk, lsh_topk):
        out = fn(emb, no_queries)
        assert out.count() == 0
        assert [f.name for f in out.schema.fields] == [
            "query_id",
            "neighbor_id",
            "rank",
            "cosine",
        ]


def test_ivf_empty_corpus_raises_cleanly(spark):
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        LongType,
        StructField,
        StructType,
    )

    import pytest as _pytest

    from cae_polars_tools_spark.operators.similarity import (
        train_ivf_centroids,
    )

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    empty = spark.createDataFrame([], schema)
    with _pytest.raises(ValueError, match="empty"):
        train_ivf_centroids(empty)


def test_incremental_dedup_semantics(spark):
    """Crafted corpus: history always wins, first-in-batch breaks
    exact ties, near-dup pairs drop the batch/larger side."""
    from pyspark.sql import functions as F

    from cae_polars_tools_spark.operators.dedup import incremental_dedup

    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    hist_b = "kilo lima mike november oscar papa quebec romeo sierra tango"
    uniq = "one two three four five six seven eight nine ten"
    rows = [
        (0, "hist", base),                      # history
        (1, "hist", hist_b),                    # history
        (2, "new", base),                       # exact dup of history 0
        (3, "new", hist_b + " uniform"),        # near-dup of history 1
        (4, "new", uniq),                       # survivor
        (5, "new", uniq),                       # exact dup of 4 (in batch)
        (6, "new", uniq + " extra"),            # near-dup of 4 (in batch)
        (7, "new", "zeta eta theta iota kappa lambda mu nu xi omicron"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = sorted(
        r["doc_id"]
        for r in incremental_dedup(docs, F.col("source") == "new").collect()
    )
    assert out == [4, 7]


def test_semantic_dedup_precision_and_planted_recall(spark, sf_small):
    """Every semantic pair must exist in the exact all-pairs ground
    truth with the identical cosine (verification is exact, so
    precision is 1 by construction); identical planted vectors are
    NEVER missed (they share a cluster); and overall recall vs the
    unblocked ground truth holds a measured floor."""
    import numpy as np

    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.operators.dedup import (
        COSINE_DEDUP_THRESHOLD,
        _tiled_cosine_pairs,
        semantic_dedup_pairs,
    )

    e = read_table(spark, sf_small, "embeddings").select("vec_id", "embedding")
    pdf = e.toPandas()
    truth = _tiled_cosine_pairs(
        pdf["vec_id"].to_numpy().astype(np.int64),
        np.stack(pdf["embedding"].to_numpy()),
        COSINE_DEDUP_THRESHOLD,
    )
    truth_map = {
        (int(a), int(b)): round(float(c), 6)
        for a, b, c in zip(
            truth["vec_id_a"], truth["vec_id_b"], truth["raw_cos"]
        )
    }
    got = {
        (r["vec_id_a"], r["vec_id_b"]): r["cosine"]
        for r in semantic_dedup_pairs(e).collect()
    }
    assert got, "no semantic pairs found at all"
    for pair, cos in got.items():
        assert pair in truth_map and truth_map[pair] == cos, pair
    recall = len(got) / len(truth_map)
    # loose floor: the synthetic vectors have NO strong near-dups
    # (max pair cosine < 0.6), so every truth pair is a weakly-similar
    # random pair — the documented worst case for learned blocking
    # (measured 0.36 at 8 centroids; see semantic_dedup_pairs docs)
    assert recall >= 0.25, f"semantic recall collapsed: {recall:.2f}"

    # planted exact duplicates: identical vectors assign identically
    planted = spark.createDataFrame(
        pdf.assign(vec_id=pdf["vec_id"] + 100_000).head(3)
    ).unionByName(e)
    planted_pairs = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in semantic_dedup_pairs(planted).collect()
    }
    for i in range(3):
        vid = int(pdf["vec_id"].iloc[i])
        assert (vid, vid + 100_000) in planted_pairs


def test_semantic_dedup_deterministic_and_drop_list(spark, sf_small):
    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.operators.dedup import (
        semantic_dedup,
        semantic_dedup_pairs,
    )

    e = read_table(spark, sf_small, "embeddings").select("vec_id", "embedding")
    p1 = sorted(map(tuple, semantic_dedup_pairs(e).collect()))
    p2 = sorted(map(tuple, semantic_dedup_pairs(e).collect()))
    assert p1 == p2 and len(p1) > 0

    drops = semantic_dedup(e).collect()
    pair_ids = {a for a, _, _ in p1} | {b for _, b, _ in p1}
    drop_ids = {r["drop_id"] for r in drops}
    keep_ids = {r["keep_id"] for r in drops}
    # survivors are component minima: never dropped, and every dropped
    # id appeared in some pair
    assert drop_ids <= pair_ids
    assert not (drop_ids & keep_ids)
    for r in drops:
        assert r["keep_id"] < r["drop_id"]


def test_winnow_guarantee_and_position_independence(spark):
    """The winnowing contract: any common substring of length >=
    w + k - 1 shares at least one fingerprint, REGARDLESS of where it
    sits in either document; disjoint-alphabet documents share none;
    identical documents share everything."""
    from cae_polars_tools_spark.operators.dedup import (
        WINNOW_K,
        WINNOW_W,
        winnow_pairs,
        winnowed_fingerprints,
    )

    core = "the stolen paragraph that appears verbatim in both docs"
    assert len(core) >= WINNOW_W + WINNOW_K - 1
    docs = spark.createDataFrame(
        [
            (1, "intro alpha beta " + core + " tail gamma delta"),
            (2, "zzz completely different framing here " + core),
            (3, "qqq xxx jjj vvv kkk www qqq xxx jjj vvv kkk www qq"),
            (4, "intro alpha beta " + core + " tail gamma delta"),  # = 1
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["doc_id_a"], r["doc_id_b"]): r["n_shared"]
        for r in winnow_pairs(docs, min_shared=1).collect()
    }
    assert (1, 2) in pairs  # shared span detected at different offsets
    assert (1, 4) in pairs and (2, 4) in pairs
    assert not any(3 in p for p in pairs)  # disjoint alphabet

    fps = {
        r["doc_id"]: set(r["f"])
        for r in docs.select(
            "doc_id", winnowed_fingerprints("text").alias("f")
        ).collect()
    }
    assert fps[1] == fps[4]  # identical text -> identical fingerprints
    assert pairs[(1, 4)] == len(fps[1])
    # the (1,2) overlap is exactly the planted span (plus nothing from
    # the unrelated framing)
    assert 1 <= pairs[(1, 2)] <= len(fps[1])


def test_winnow_boilerplate_cap_drops_quadratic_fingerprints(spark):
    """A fingerprint present in more than max_df documents (license-
    header boilerplate) is excluded from pair generation."""
    from cae_polars_tools_spark.operators.dedup import winnow_pairs

    boiler = "this exact license header appears in every single doc"
    docs = spark.createDataFrame(
        [(i, f"unique prefix number {i} distinct words " + boiler)
         for i in range(8)],
        "doc_id long, text string",
    )
    # cap below the corpus size: the boilerplate fingerprints (df=8)
    # vanish; the template prefixes still leak a couple of low-df
    # selection stragglers, but none reaches the default min_shared
    # threshold, so no pair survives
    assert winnow_pairs(docs, max_df=4).count() == 0
    # with the cap above the corpus size every pair appears
    assert winnow_pairs(docs, min_shared=1, max_df=100).count() == 8 * 7 / 2


def test_winnow_short_and_null_documents(spark):
    from cae_polars_tools_spark.operators.dedup import (
        winnowed_fingerprints,
    )

    docs = spark.createDataFrame(
        [(1, "tiny"), (2, None), (3, "just over the k-gram threshold")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r["f"]
        for r in docs.select(
            "doc_id", winnowed_fingerprints("text").alias("f")
        ).collect()
    }
    assert rows[1] == [] and rows[2] == []
    assert len(rows[3]) >= 1


def test_repeated_spans_offsets_and_content(spark):
    """Span-level dedup contract: a boilerplate paragraph shared by
    >= min_docs documents is reported ONCE per occurrence as a
    maximal span, with character offsets that actually cut the shared
    text out of each document, the same cluster_id across its
    occurrences, and position independence (different offsets per
    doc). Docs lacking the boilerplate report nothing."""
    from cae_polars_tools_spark.operators.dedup import repeated_spans

    boiler = "SPDX-License-Identifier: Apache-2.0 OR MIT!"  # 43 chars
    texts = {
        1: "aaaa " + boiler + " unique tail one xxxxxxx",
        2: boiler + " totally different body 22222222222",
        3: "prefix text here 33 " + boiler,
        4: "no shared content at all in this document 4444",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    out = repeated_spans(docs, min_docs=3, k=16, min_len=24).collect()
    by_doc = {r["doc_id"]: r for r in out}
    assert set(by_doc) == {1, 2, 3}
    clusters = set()
    for doc_id, r in by_doc.items():
        s, ln = r["span_start"], r["span_len"]
        assert texts[doc_id][s : s + ln] == boiler
        clusters.add(r["cluster_id"])
    assert len(clusters) == 1  # same content, same cluster
    # position independence: the three offsets differ
    assert len({r["span_start"] for r in by_doc.values()}) == 3
    # threshold: with min_docs=4 nothing is reported
    assert repeated_spans(docs, min_docs=4, k=16, min_len=24).count() == 0
    # guard: a min_len below the window size is a contract violation
    import pytest

    with pytest.raises(ValueError, match="min_len"):
        repeated_spans(docs, min_docs=2, k=16, min_len=8)


def test_repeated_spans_short_null_and_multiple_runs(spark):
    """Null/short documents yield no postings; two disjoint shared
    spans inside one document come back as two separate runs, not one
    merged span."""
    from cae_polars_tools_spark.operators.dedup import repeated_spans

    a = "first shared boilerplate run!"  # 29 chars
    b = "second different shared text!"  # 29 chars
    # adjacent characters differ across docs on BOTH sides of each
    # shared span, so the maximal runs are exactly a and b — a shared
    # neighbor char would (correctly) extend the span past them
    texts = {
        1: a + "X---interleaved unique---P" + b + "q",
        2: a + "y.zz/" + b + "w trailing junk",
        3: "lead-in 3." + a + "z mid 3~" + b + "e",
        4: None,
        5: "short",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    rows = repeated_spans(docs, min_docs=3, k=16, min_len=24).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert set(per_doc) == {1, 2, 3}
    for doc_id, rs in per_doc.items():
        got = sorted(
            texts[doc_id][r["span_start"] : r["span_start"] + r["span_len"]]
            for r in rs
        )
        assert got == sorted([a, b]), (doc_id, got)


def test_cut_repeated_spans_splice_and_overlap_merge(spark):
    """The boilerplate strip: shared spans vanish from every doc,
    unique text survives verbatim, docs without spans pass through
    with n_cut=0, and OVERLAPPING character ranges (runs separated by
    a short unflagged gap still overlap by < k chars) merge before
    the splice — no double-cut, no stray fragment."""
    from cae_polars_tools_spark.operators.dedup import cut_repeated_spans

    boiler = "SPDX-License-Identifier: Apache-2.0 OR MIT!"
    texts = {
        1: "aaaa." + boiler + ".unique tail one xxxxxxx",
        2: boiler + "~totally different body 22222222222",
        3: "prefix text here 33." + boiler,
        4: "no shared content at all in this document 4444",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in cut_repeated_spans(
            docs, min_docs=3, k=16, min_len=24
        ).collect()
    }
    assert set(rows) == {1, 2, 3, 4}
    assert rows[1]["cleaned"] == "aaaa." + ".unique tail one xxxxxxx"
    assert rows[2]["cleaned"] == "~totally different body 22222222222"
    assert rows[3]["cleaned"] == "prefix text here 33."
    assert rows[4]["cleaned"] == texts[4] and rows[4]["n_cut"] == 0
    for i in (1, 2, 3):
        assert rows[i]["n_cut"] == len(boiler)
    # the cleaned corpus re-run finds nothing left to cut
    cleaned = spark.createDataFrame(
        [(i, r["cleaned"]) for i, r in rows.items()],
        "doc_id long, text string",
    )
    again = cut_repeated_spans(cleaned, min_docs=3, k=16, min_len=24)
    assert again.agg({"n_cut": "sum"}).first()[0] == 0


def test_pca_matches_numpy_exact(spark, sf_small):
    """The one-pass distributed Gram/mean reduction must reproduce
    numpy's exact PCA on the same data: eigenvalues to float
    tolerance, components up to the documented sign convention, and
    projections consistent with (x - mean) @ components.T."""
    import numpy as np

    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.operators.similarity import (
        project_pca,
        train_pca,
    )

    e = read_table(spark, sf_small, "embeddings")
    k = 6
    model = train_pca(e, k)

    M = np.stack(
        e.select("embedding").toPandas()["embedding"].to_numpy()
    ).astype(np.float64)
    mean = M.mean(axis=0)
    cov = (M.T @ M) / len(M) - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    want_vals = evals[order]
    want_comps = evecs[:, order].T
    for i in range(k):
        j = int(np.argmax(np.abs(want_comps[i])))
        if want_comps[i, j] < 0:
            want_comps[i] = -want_comps[i]

    assert np.allclose(model["mean"], mean, atol=1e-9)
    assert np.allclose(model["explained_variance"], want_vals, atol=1e-9)
    assert np.allclose(model["components"], want_comps, atol=1e-7)
    # orthonormal basis
    G = model["components"] @ model["components"].T
    assert np.allclose(G, np.eye(k), atol=1e-9)
    # variance ordering
    ev = model["explained_variance"]
    assert all(ev[i] >= ev[i + 1] - 1e-12 for i in range(k - 1))

    proj = {
        r["vec_id"]: np.array(r["pca"])
        for r in project_pca(e, model).select("vec_id", "pca").collect()
    }
    ids = e.select("vec_id").toPandas()["vec_id"].to_numpy()
    want_proj = (M - mean) @ model["components"].T
    for row_i, vid in enumerate(ids):
        assert np.allclose(proj[vid], want_proj[row_i], atol=1e-9)


def test_pca_validates_inputs(spark, sf_small):
    import pytest

    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.operators.similarity import train_pca

    e = read_table(spark, sf_small, "embeddings")
    with pytest.raises(ValueError, match="k must be"):
        train_pca(e, 0)
    with pytest.raises(ValueError, match="exceeds the embedding"):
        train_pca(e, 1000)
    with pytest.raises(ValueError, match="empty"):
        train_pca(e.filter("vec_id < 0"), 2)


def test_pagerank_matches_numpy_power_iteration(spark):
    """Small directed graph: the distributed loop must reproduce a
    numpy power iteration of the same algebra (no dangling
    redistribution) to float tolerance, with multi-edge multiplicity
    honored; on a dangling-free graph the ranks sum to ~1."""
    import numpy as np

    from cae_polars_tools_spark.operators.graph import pagerank

    # 4-node graph incl. a doubled edge (1->2 twice)
    edges = [(1, 2), (1, 2), (1, 3), (2, 3), (3, 1), (4, 1), (3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["r"] for r in pagerank(df, iters=12).collect()}
    # both physical strategies agree to float tolerance (the local
    # numpy path and the distributed loop share the algebra but not
    # the accumulation order)
    dist = {
        r["node"]: r["r"]
        for r in pagerank(df, iters=12, local_threshold=0).collect()
    }
    assert set(dist) == set(got)
    assert all(abs(dist[v] - got[v]) < 1e-12 for v in got)

    nodes = sorted({u for e in edges for u in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    M = np.zeros((n, n))
    out = {}
    for s, d in edges:
        out[s] = out.get(s, 0) + 1
    for s, d in edges:
        M[idx[d], idx[s]] += 1.0 / out[s]
    r = np.full(n, 1.0 / n)
    for _ in range(12):
        r = (1 - 0.85) / n + 0.85 * (M @ r)
    for v in nodes:
        assert abs(got[v] - r[idx[v]]) < 1e-12, v
    assert abs(sum(got.values()) - 1.0) < 1e-9  # no dangling nodes here
    # multiplicity matters: node 2 outranks symmetric-but-single peers
    assert got[2] > got[4]


def test_pagerank_checkpoint_variant_and_validation(spark):
    import pytest

    from cae_polars_tools_spark.operators.graph import pagerank

    edges = [(1, 2), (2, 3), (3, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    plain = {r["node"]: r["r"] for r in pagerank(df, iters=9).collect()}
    cut = {
        r["node"]: r["r"]
        for r in pagerank(df, iters=9, checkpoint_every=3).collect()
    }
    assert plain == cut  # lineage cuts change nothing numerically
    with pytest.raises(ValueError, match="iters"):
        pagerank(df, iters=0)
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping=1.5)
    with pytest.raises(ValueError, match="empty"):
        pagerank(df.filter("src < 0"))


def test_fuzzy_pairs_complete_vs_bruteforce(spark):
    """The PassJoin pigeonhole blocking must find EVERY pair within
    max_dist — completeness checked against python-Levenshtein brute
    force over a crafted set with substitutions, insertions and
    deletions at head/middle/tail positions, for d=1 AND d=2."""
    import itertools

    from cae_polars_tools_spark.operators.dedup import fuzzy_pairs

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    words = [
        "martha", "marhta", "martya", "amartha", "marth", "xmartha",
        "kitten", "sitten", "sittin", "sitting", "mitten", "kitte",
        "alpha", "alpho", "aalpha", "lpha", "alphaa", "blpha",
        "ab", "ba", "a", "b", "abc", "abd", "bbc",
    ]
    rows = [(i, w) for i, w in enumerate(words)]
    df = spark.createDataFrame(rows, "id long, s string")
    for d in (1, 2):
        got = {
            (r["id_a"], r["id_b"]): r["dist"]
            for r in fuzzy_pairs(df, max_dist=d).collect()
        }
        want = {}
        for (i, a), (j, b) in itertools.combinations(rows, 2):
            dist = lev(a, b)
            if dist <= d:
                want[(i, j)] = dist
        assert got == want, f"d={d}: missing {set(want) - set(got)}"


def test_fuzzy_pairs_validation(spark):
    import pytest

    from cae_polars_tools_spark.operators.dedup import fuzzy_pairs

    df = spark.createDataFrame([(1, "x")], "id long, s string")
    with pytest.raises(ValueError, match="max_dist"):
        fuzzy_pairs(df, max_dist=0)


def test_fuzzy_pairs_complete_on_random_strings(spark):
    """Randomized completeness: 80 strings over a 3-letter alphabet
    (lengths 1-8, duplicates removed) make near-pairs abundant; the
    blocking must reproduce brute force EXACTLY for d=1 and d=2."""
    import itertools

    import numpy as np

    from cae_polars_tools_spark.operators.dedup import fuzzy_pairs

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    rng = np.random.default_rng(2024)
    seen = []
    for _ in range(80):
        n = int(rng.integers(1, 9))
        seen.append("".join(rng.choice(list("abc"), size=n)))
    words = sorted(set(seen))
    rows = [(i, w) for i, w in enumerate(words)]
    df = spark.createDataFrame(rows, "id long, s string")
    for d in (1, 2):
        got = {
            (r["id_a"], r["id_b"]): r["dist"]
            for r in fuzzy_pairs(df, max_dist=d).collect()
        }
        want = {
            (i, j): lev(a, b)
            for (i, a), (j, b) in itertools.combinations(rows, 2)
            if lev(a, b) <= d
        }
        assert got == want, (
            f"d={d}: missing {sorted(set(want) - set(got))[:5]} "
            f"extra {sorted(set(got) - set(want))[:5]}"
        )


def test_count_triangles_known_graph_and_multi_edges(spark):
    """Triangle counts on a hand-checkable graph: K4 plus a pendant
    (every K4 vertex is in C(3,2)=3 triangles, the pendant in none);
    multi-edges and both directions collapse to one undirected edge."""
    from cae_polars_tools_spark.operators.graph import count_triangles

    edges = [(a, b) for a in range(4) for b in range(4) if a != b]
    edges += [(3, 4), (4, 3), (3, 4)]  # pendant with duplicates
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["triangles"] for r in count_triangles(df).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3, 4: 0}
    # a hub star (no triangles) must not explode nor miscount
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 30)], "src long, dst long"
    )
    got2 = {r["node"]: r["triangles"] for r in count_triangles(star).collect()}
    assert set(got2.values()) == {0}


def test_count_triangles_local_equals_distributed(spark):
    """The AQE-style strategy pick must be invisible: the driver-side
    pandas path (small graph) and the distributed orientation/wedge
    pipeline (local_threshold=0) agree exactly — same (degree, id)
    orientation, same closing join, integer-exact both ways."""
    import random

    from cae_polars_tools_spark.operators.graph import count_triangles

    rng = random.Random(17)
    edges = list({(rng.randrange(40), rng.randrange(40)) for _ in range(320)})
    df = spark.createDataFrame(edges, "src long, dst long")
    local = {
        (r["node"], r["triangles"]) for r in count_triangles(df).collect()
    }
    dist = {
        (r["node"], r["triangles"])
        for r in count_triangles(df, local_threshold=0).collect()
    }
    assert local == dist and local
    assert any(t > 0 for _, t in local)  # the graph actually has triangles


def test_ivfpq_persisted_index_equals_inline(spark, tmp_path):
    """The persisted IVF-PQ index (build once, query from the codes
    table) must answer bit-equal to the inline cascade over the same
    source table — for both the ADC-only ranking and the exact
    re-rank path — and a rebuild over unchanged data is a no-op for
    results."""
    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.operators.similarity import (
        N_QUERIES,
        PQ_RERANK,
        build_ivfpq_index,
        ivfpq_topk,
        load_ivfpq_meta,
        query_ivfpq_index,
    )
    from pyspark.sql import functions as F

    e = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES)
    root = str(tmp_path / "idx")
    meta = build_ivfpq_index(e, root, fingerprint="t1")
    assert load_ivfpq_meta(root)["fingerprint"] == "t1"
    assert meta["format"] == "ivfpq-v1"

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    # ADC-only: codes table is the whole corpus-side read
    assert rows(query_ivfpq_index(spark, root, q)) == rows(
        ivfpq_topk(e, q, rerank=None)
    )
    # exact re-rank cascade
    assert rows(
        query_ivfpq_index(
            spark, root, q, rerank=PQ_RERANK, embeddings=e
        )
    ) == rows(ivfpq_topk(e, q))
    # re-rank without the float table is a loud error
    import pytest as _pytest

    with _pytest.raises(ValueError, match="float-vector"):
        query_ivfpq_index(spark, root, q, rerank=PQ_RERANK).collect()


def test_ivfpq_index_append_and_delete_lifecycle(spark, tmp_path):
    """Incremental maintenance of the persisted IVF-PQ index: append
    encodes new vectors under the FROZEN model (bit-equal to encoding
    the full corpus with that model), duplicate ids refuse loudly,
    and copy-on-write delete removes ids from query results while
    flipping the codes pointer last."""
    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.operators.similarity import (
        N_QUERIES,
        _encode_with_index_model,
        _ivfpq_query,
        _load_ivfpq_model,
        append_ivfpq_index,
        build_ivfpq_index,
        delete_ivfpq_index,
        load_ivfpq_meta,
        query_ivfpq_index,
    )
    from pyspark.sql import functions as F

    e = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES)
    half1 = e.filter(F.col("vec_id") % 2 == 0)
    half2 = e.filter(F.col("vec_id") % 2 == 1)
    root = str(tmp_path / "idx")
    build_ivfpq_index(half1, root, fingerprint="half1")
    got = append_ivfpq_index(spark, root, half2)
    assert got["rows_appended"] == half2.count()

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    # appended index == frozen-model encode of the FULL corpus
    meta = load_ivfpq_meta(root)
    centroids, codebooks = _load_ivfpq_model(spark, root, meta)
    cand = _encode_with_index_model(e, centroids, codebooks).withColumnRenamed(
        "vec_id", "neighbor_id"
    )
    want = _ivfpq_query(
        cand, q, centroids, codebooks, 5, 6, None, None
    )
    assert rows(query_ivfpq_index(spark, root, q)) == rows(want)

    # duplicate ids refuse loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="collide"):
        append_ivfpq_index(spark, root, half2.limit(3))

    # duplicates WITHIN the appended frame refuse loudly too (the
    # cross-check against existing ids cannot see them)
    from cae_polars_tools_spark.operators.similarity import EMBED_DIM

    two = spark.createDataFrame(
        [(10_000_001, [0.5] * EMBED_DIM)] * 2,
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(ValueError, match="duplicate vec_ids"):
        append_ivfpq_index(spark, root, two)

    # CoW delete: victims vanish from results, pointer flipped last
    before = rows(query_ivfpq_index(spark, root, q))
    victims = sorted(
        {r[1] for r in before}  # neighbor_id column
    )[:3]
    stats = delete_ivfpq_index(
        spark, root, f"vec_id IN ({','.join(map(str, victims))})"
    )
    assert stats["rows_deleted"] == 3
    assert load_ivfpq_meta(root)["codes_dir"] == "codes_v1"
    after = rows(query_ivfpq_index(spark, root, q))
    assert not {r[1] for r in after} & set(victims)
    # non-victim corpus unchanged: result equals frozen-model query
    # over the surviving vectors
    surv = e.join(
        spark.createDataFrame(
            [(v,) for v in victims], "vec_id long"
        ),
        "vec_id",
        "left_anti",
    )
    cand2 = _encode_with_index_model(
        surv, centroids, codebooks
    ).withColumnRenamed("vec_id", "neighbor_id")
    want2 = _ivfpq_query(
        cand2, q, centroids, codebooks, 5, 6, None, None
    )
    assert after == rows(want2)


def test_ivfpq_index_compaction_preserves_results(spark, tmp_path):
    """Compacting the codes table (post-ingest small-file cleanup)
    must shrink the file count, keep per-cell partitioning, flip the
    pointer last, and leave query results bit-identical."""
    import glob

    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.operators.similarity import (
        N_QUERIES,
        append_ivfpq_index,
        build_ivfpq_index,
        compact_ivfpq_index,
        load_ivfpq_meta,
        query_ivfpq_index,
    )
    from pyspark.sql import functions as F

    e = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES)
    root = str(tmp_path / "idx")
    build_ivfpq_index(e.filter(F.col("vec_id") % 3 == 0), root)
    # several small appends -> segment-file buildup
    for r in (1, 2):
        append_ivfpq_index(
            spark, root, e.filter(F.col("vec_id") % 3 == r)
        )

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    def nfiles(d):
        return len(glob.glob(f"{d}/*/*.parquet"))

    before = rows(query_ivfpq_index(spark, root, q))
    n_before = nfiles(f"{root}/codes")
    stats = compact_ivfpq_index(spark, root)
    assert load_ivfpq_meta(root)["codes_dir"] == stats["codes_dir"]
    assert stats["codes_dir"].startswith("codes_v")
    n_after = nfiles(f"{root}/{stats['codes_dir']}")
    assert n_after < n_before
    # per-cell layout survives (cl=... directories exist)
    assert glob.glob(f"{root}/{stats['codes_dir']}/cl=*")
    assert rows(query_ivfpq_index(spark, root, q)) == before


def test_kcore_hand_graphs(spark):
    """K4 + a pendant chain: the 3-core is exactly the K4 (every
    clique member keeps 3 in-core neighbors); chain nodes peel away
    over successive rounds. A 2-core of a pure path is empty."""
    from cae_polars_tools_spark.operators.graph import kcore

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    chain = [(3, 10), (10, 11), (11, 12)]
    df = spark.createDataFrame(k4 + chain, "src long, dst long")
    got = {
        r["node"]: r["core_degree"]
        for r in kcore(df, 3).collect()
    }
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "src long, dst long"
    )
    assert kcore(path, 2).count() == 0


def test_kcore_multi_edge_and_direction_invariant(spark):
    """Duplicate and reversed edges must not inflate degrees: the
    core is defined on the distinct undirected graph."""
    from cae_polars_tools_spark.operators.graph import kcore

    tri = [(1, 2), (2, 1), (1, 2), (2, 3), (3, 1), (1, 3)]
    df = spark.createDataFrame(tri, "src long, dst long")
    got = {
        r["node"]: r["core_degree"] for r in kcore(df, 2).collect()
    }
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_raises_without_convergence(spark):
    """A long path under k=2 peels two endpoints per round; with
    max_iters below the peel depth the operator must refuse loudly
    rather than return a half-peeled graph."""
    import pytest

    from cae_polars_tools_spark.operators.graph import kcore

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "src long, dst long"
    )
    with pytest.raises(ValueError, match="fixed point"):
        kcore(path, 2, max_iters=2)


def test_kcore_local_equals_distributed(spark):
    """The AQE-style strategy pick must be invisible: driver-side peel
    (small graph) and the distributed loop (local_threshold=0) agree
    exactly."""
    from cae_polars_tools_spark.operators.graph import kcore

    import random

    rng = random.Random(9)
    edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(160)})
    df = spark.createDataFrame(edges, "src long, dst long")
    local = {
        (r["node"], r["core_degree"]) for r in kcore(df, 4).collect()
    }
    dist = {
        (r["node"], r["core_degree"])
        for r in kcore(df, 4, local_threshold=0).collect()
    }
    assert local == dist and local


def test_kcore_max_iters_boundary_parity(spark):
    """max_iters counts EDGE-REMOVING rounds identically on both
    strategy paths (the edge-frame view: a node whose last edge
    vanished is gone the same round): a 13-node path under k=2 peels
    its 12 edges in 6 rounds, so max_iters=6 succeeds (empty core)
    and max_iters=5 refuses — on the local AND the distributed
    path."""
    import pytest

    from cae_polars_tools_spark.operators.graph import kcore

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "src long, dst long"
    )
    for thresh in (2_000_000, 0):  # local, then distributed
        assert kcore(path, 2, max_iters=6, local_threshold=thresh).count() == 0
        with pytest.raises(ValueError, match="fixed point"):
            kcore(path, 2, max_iters=5, local_threshold=thresh)


def test_repeated_spans_character_offsets_past_non_ascii(spark):
    """Offsets are CHARACTER offsets even after multi-byte characters:
    a doc whose prefix contains non-ASCII text must still report the
    shared span at positions that slice it out exactly, and the
    span-cut consumer must splice the right characters."""
    from cae_polars_tools_spark.operators.dedup import (
        cut_repeated_spans,
        repeated_spans,
    )

    boiler = "SPDX-License-Identifier: Apache-2.0 OR MIT!"
    texts = {
        1: "café — naïve prefix: " + boiler + " tail one",
        2: boiler + " zwei körper später",
        3: "préambule № trois ... " + boiler,
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    out = repeated_spans(docs, min_docs=3, k=16, min_len=24).collect()
    assert {r["doc_id"] for r in out} == {1, 2, 3}
    for r in out:
        s, ln = r["span_start"], r["span_len"]
        assert texts[r["doc_id"]][s : s + ln] == boiler
    cleaned = {
        r["doc_id"]: r["cleaned"]
        for r in cut_repeated_spans(
            docs, min_docs=3, k=16, min_len=24
        ).collect()
    }
    for i, t in texts.items():
        assert boiler not in cleaned[i]
        assert cleaned[i] == t.replace(boiler, "")


def test_finalize_spans_validates_like_batch(spark, tmp_path):
    """The streaming finalize must reject the same bad parameters the
    batch path rejects — shared validation, shared kernel."""
    import pytest

    from cae_polars_tools_spark.operators.dedup import (
        finalize_repeated_spans,
        span_candidate_sink,
    )

    docs = spark.createDataFrame(
        [(0, "some text " * 10)], "doc_id long, text string"
    )
    target = str(tmp_path / "st")
    span_candidate_sink(target)(docs, 0)
    with pytest.raises(ValueError, match="min_len"):
        finalize_repeated_spans(
            spark, target, docs, k=16, min_len=8
        )


def test_vacuum_ivfpq_index_removes_only_stale_generations(spark, tmp_path):
    """After compact/delete create new codes generations, vacuum drops
    every directory the pointer no longer references — and ONLY those
    (the live generation and the model tables stay; probe answers are
    unchanged)."""
    import os

    from pyspark.sql import functions as F

    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.operators.similarity import (
        N_QUERIES,
        build_ivfpq_index,
        compact_ivfpq_index,
        delete_ivfpq_index,
        load_ivfpq_meta,
        query_ivfpq_index,
        vacuum_ivfpq_index,
    )

    e = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES)
    root = str(tmp_path / "idx")
    build_ivfpq_index(e, root)
    compact_ivfpq_index(spark, root)                  # codes -> codes_v1
    delete_ivfpq_index(spark, root, "vec_id = -1")    # codes_v1 -> codes_v2
    want = sorted(tuple(r) for r in query_ivfpq_index(spark, root, q).collect())

    removed = vacuum_ivfpq_index(root)
    assert removed == ["codes", "codes_v1"]
    assert load_ivfpq_meta(root)["codes_dir"] == "codes_v2"
    assert os.path.isdir(f"{root}/codes_v2")
    assert os.path.isdir(f"{root}/model")
    assert not os.path.isdir(f"{root}/codes")
    got = sorted(tuple(r) for r in query_ivfpq_index(spark, root, q).collect())
    assert got == want
    # idempotent
    assert vacuum_ivfpq_index(root) == []


def test_ivfpq_compact_and_delete_retry_after_crash_orphan(spark, tmp_path):
    """A crash between an IVF-PQ verb's version-write and pointer flip
    leaves an orphaned codes_v1 directory; the RETRY must clear it and
    succeed (compact heals via overwrite mode, delete via the fresh-
    destination rule) with probe answers unchanged."""
    import os

    from pyspark.sql import functions as F

    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.operators.similarity import (
        N_QUERIES,
        build_ivfpq_index,
        compact_ivfpq_index,
        delete_ivfpq_index,
        query_ivfpq_index,
    )

    e = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES)

    def rows(root):
        return sorted(
            tuple(r) for r in query_ivfpq_index(spark, root, q).collect()
        )

    # compact retry
    root = str(tmp_path / "c")
    build_ivfpq_index(e, root)
    want = rows(root)
    os.makedirs(f"{root}/codes_v1")
    with open(f"{root}/codes_v1/junk.txt", "w") as fh:
        fh.write("crash leftovers")
    out = compact_ivfpq_index(spark, root)
    assert out["codes_dir"] == "codes_v1"
    assert not os.path.exists(f"{root}/codes_v1/junk.txt")
    assert rows(root) == want

    # delete retry
    root = str(tmp_path / "d")
    build_ivfpq_index(e, root)
    want = rows(root)
    victim = want[0][1]  # an answering neighbor id
    os.makedirs(f"{root}/codes_v1")
    with open(f"{root}/codes_v1/junk.txt", "w") as fh:
        fh.write("crash leftovers")
    stats = delete_ivfpq_index(spark, root, f"vec_id = {victim}")
    assert stats["codes_dir"] == "codes_v1"
    assert stats["rows_deleted"] == 1
    assert not os.path.exists(f"{root}/codes_v1/junk.txt")
    assert victim not in {t[1] for t in rows(root)}


def test_ivfpq_delete_commits_only_rewritten_files(spark, tmp_path):
    """Manifest pin for the IVF-PQ CoW verbs: a takedown delete of
    one vector rewrites only its inverted list's file(s); every other
    cell segment is re-referenced (zero copies, inodes untouched),
    queries still answer bit-equal, and describe_ivfpq_index_history
    replays the whole build → append → delete → compact → vacuum
    chain."""
    import os as _os

    from pyspark.sql import functions as F

    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.manifest import load_manifest
    from cae_polars_tools_spark.operators.similarity import (
        N_QUERIES,
        append_ivfpq_index,
        build_ivfpq_index,
        compact_ivfpq_index,
        delete_ivfpq_index,
        describe_ivfpq_index_history,
        query_ivfpq_index,
        vacuum_ivfpq_index,
    )
    from cae_polars_tools_spark.sources.zarr_format import ByteStore

    e = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES)
    root = str(tmp_path / "idx")
    hold_out = (
        e.orderBy(F.col("vec_id").desc()).first()["vec_id"]
    )
    build_ivfpq_index(e.filter(F.col("vec_id") != hold_out), root)
    append_ivfpq_index(
        spark, root, e.filter(F.col("vec_id") == hold_out)
    )
    want = sorted(
        tuple(r) for r in query_ivfpq_index(spark, root, q).collect()
        if r["neighbor_id"] != hold_out
    )

    def inodes(d):
        return {
            _os.path.join(r, f): _os.stat(_os.path.join(r, f)).st_ino
            for r, _dd, fs in _os.walk(d)
            for f in fs
            if f.endswith(".parquet")
        }

    before = inodes(f"{root}/codes")
    stats = delete_ivfpq_index(spark, root, f"vec_id = {hold_out}")
    assert stats["files_rewritten"] >= 1
    assert stats["files_referenced"] >= 1
    assert "files_copied" not in stats
    # zero copies in the new generation; untouched inodes intact
    for r, _dd, fs in _os.walk(f"{root}/{stats['codes_dir']}"):
        assert not any(f.startswith("copied-") for f in fs)
    for f, ino in before.items():
        assert _os.stat(f).st_ino == ino
    m = load_manifest(ByteStore.for_path(root), stats["codes_dir"])
    assert any(r.startswith("codes/") for r in m["files"])
    got = sorted(
        tuple(r) for r in query_ivfpq_index(spark, root, q).collect()
    )
    assert got == want

    compact_ivfpq_index(spark, root)
    vacuum_ivfpq_index(root)
    assert sorted(
        tuple(r) for r in query_ivfpq_index(spark, root, q).collect()
    ) == want
    ops = [h["op"] for h in describe_ivfpq_index_history(root)]
    assert ops == ["build", "append", "delete", "compact", "vacuum"]


def test_ivfpq_emptied_by_takedown_stays_operable(spark, tmp_path):
    """Deleting EVERY vector must leave the IVF-PQ index operable: a
    repeat takedown is an idempotent no-op, probes return empty, and
    frozen-model appends re-populate it."""
    from pyspark.sql import functions as F

    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.operators.similarity import (
        N_QUERIES,
        append_ivfpq_index,
        build_ivfpq_index,
        delete_ivfpq_index,
        query_ivfpq_index,
    )

    e = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    root = str(tmp_path / "idx")
    build_ivfpq_index(e, root)
    delete_ivfpq_index(spark, root, "vec_id >= 0")
    q = e.filter(F.col("vec_id") < N_QUERIES)
    assert query_ivfpq_index(spark, root, q).count() == 0
    again = delete_ivfpq_index(spark, root, "vec_id = 1")
    assert again["rows_deleted"] == 0 and again["files_rewritten"] == 0
    append_ivfpq_index(spark, root, e.filter("vec_id < 50"))
    assert query_ivfpq_index(spark, root, q).count() > 0


def test_ivfpq_append_retry_after_crash_before_adopt(spark, tmp_path):
    """The IVF-PQ twin of the MinHash append-crash discipline: a crash
    between the codes segment write and the manifest adopt leaves
    unmanifested orphans; the ingest sink's replay re-encodes the same
    vec_ids (the anti-join cannot see orphans) but delta adoption
    keeps the orphans out — no duplicate vec_id rows — and the vacuum
    live-dir sweep reclaims them."""
    from pyspark.sql import functions as F

    from cae_polars_tools_spark.io import read_table
    from cae_polars_tools_spark.manifest import data_file_refs, refs_of
    from cae_polars_tools_spark.operators.similarity import (
        _read_codes,
        build_ivfpq_index,
        ivfpq_ingest_sink,
        load_ivfpq_meta,
        vacuum_ivfpq_index,
    )
    from cae_polars_tools_spark.sources.zarr_format import ByteStore

    e = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    half1 = e.filter(F.col("vec_id") % 2 == 0)
    half2 = e.filter(F.col("vec_id") % 2 == 1)
    root = str(tmp_path / "idx")
    build_ivfpq_index(half1, root, fingerprint="h1")
    store = ByteStore.for_path(root)
    meta = load_ivfpq_meta(root)
    codes_dir = meta.get("codes_dir", "codes")
    saved = store.get(f"{codes_dir}/_MANIFEST.json")

    sink = ivfpq_ingest_sink(root)
    sink(half2, batch_id=0)
    # crash simulation: segments written, adopt lost
    store.put(f"{codes_dir}/_MANIFEST.json", saved)
    # redelivered trigger (foreachBatch at-least-once)
    sink(half2, batch_id=0)

    codes = _read_codes(spark, root, load_ivfpq_meta(root))
    assert (
        codes.groupBy("vec_id").count().filter("count > 1").count() == 0
    )
    assert codes.count() == e.count()

    orphans = set(data_file_refs(store, codes_dir)) - set(
        refs_of(store, codes_dir)
    )
    assert orphans
    vacuum_ivfpq_index(root)
    assert set(data_file_refs(store, codes_dir)) == set(
        refs_of(store, codes_dir)
    )
    rec = load_ivfpq_meta(root)["history"][-1]
    assert rec["op"] == "vacuum"
    assert rec["stats"]["orphans_swept"] == len(orphans)

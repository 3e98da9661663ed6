"""Byte-level BPE tokenizer: training determinism, encode parity with
an independent reference implementation, Spark operator equivalence,
and the feed into pack_sequences."""

from __future__ import annotations

import pytest

from cae_polars_tools_spark.operators.tokenizer import (
    FIXED_MERGES,
    bpe_encode_bytes,
    bpe_merges_from_docs,
    tokenize_bpe,
    train_bpe,
)


def _reference_encode(data: bytes, merges) -> list[bytes]:
    """Slow reference: apply each merge in rank order, rescanning the
    WHOLE table after every successful merge — the textbook greedy
    definition, structured differently from the production encoder."""
    seq = [bytes([b]) for b in data]
    ranks = {m: i for i, m in enumerate(merges)}
    while True:
        candidates = [
            (ranks[p], i)
            for i, p in enumerate(zip(seq, seq[1:]))
            if p in ranks
        ]
        if not candidates:
            return seq
        best_rank = min(candidates)[0]
        a, b = merges[best_rank]
        out, i = [], 0
        while i < len(seq):
            if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out


SAMPLE = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "the rain in spain stays mainly in the plain",
    "she sells sea shells by the sea shore",
] * 4


def test_train_bpe_deterministic_and_multilevel():
    m1 = train_bpe(SAMPLE, 24)
    m2 = train_bpe(list(SAMPLE), 24)
    assert m1 == m2 and len(m1) == 24
    # training on repeated english text must produce at least one
    # MULTI-LEVEL merge (a side longer than one byte) — the general
    # path the fixed-table corpus entry cannot cover
    assert any(len(a) > 1 or len(b) > 1 for a, b in m1)


@pytest.mark.parametrize("n_merges", [4, 24, 64])
def test_encode_parity_with_reference(n_merges):
    merges = train_bpe(SAMPLE, n_merges)
    ranks = {m: i for i, m in enumerate(merges)}
    for text in SAMPLE + ["", "x", "zzzz", "the the the"]:
        data = text.encode()
        got = bpe_encode_bytes(data, ranks)
        want = _reference_encode(data, merges)
        assert got == want, (text, n_merges)
        assert b"".join(got) == data  # lossless


def test_tokenize_bpe_spark_matches_local(spark):
    import pandas as pd

    merges = train_bpe(SAMPLE, 16)
    ranks = {m: i for i, m in enumerate(merges)}
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(SAMPLE)), "text": SAMPLE})
    )
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in tokenize_bpe(df, merges).collect()
    }
    for i, t in enumerate(SAMPLE):
        assert got[i] == len(bpe_encode_bytes(t.encode(), ranks))
    # token arrays round-trip the text
    toks = {
        r["doc_id"]: r["tokens"]
        for r in tokenize_bpe(df, merges, with_tokens=True).collect()
    }
    assert "".join(toks[0]) == SAMPLE[0]


def test_counts_feed_pack_sequences(spark):
    import pandas as pd

    from cae_polars_tools_spark.operators.pipeline import pack_sequences

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(SAMPLE)), "text": SAMPLE})
    )
    counts = tokenize_bpe(df, FIXED_MERGES)
    packs = pack_sequences(counts, budget=64)
    rows = packs.collect()
    assert {r["doc_id"] for r in rows} == set(range(len(SAMPLE)))
    by_pack: dict = {}
    for r in rows:
        by_pack.setdefault(r["pack_id"], 0)
        by_pack[r["pack_id"]] += r["n_tokens"]
    assert all(v <= 64 for v in by_pack.values())


def test_merges_from_docs_bounded_and_deterministic(spark, sf_small):
    from cae_polars_tools_spark.io import read_table

    docs = read_table(spark, sf_small, "documents")
    m1 = bpe_merges_from_docs(docs, n_merges=32, sample_rows=256)
    m2 = bpe_merges_from_docs(docs, n_merges=32, sample_rows=256)
    assert m1 == m2 and 0 < len(m1) <= 32

"""Byte-level BPE tokenizer — the one LLM-pipeline stage the engine
previously assumed (``pack_sequences`` consumed externally supplied
``n_tokens``) rather than computed.

Design (the GPT-2 recipe, from the public algorithm):

* **Training** (:func:`train_bpe`) is driver-side over a BOUNDED
  seeded sample — like the IVF quantizer, merge quality needs
  O(vocab × oversampling) bytes, not the corpus. Deterministic: pair
  counts tie-break on the pair bytes themselves.
* **Encoding** (:func:`tokenize_bpe`) is the distributed hot path: the
  merges table (a few thousand entries, kilobytes) rides to executors
  inside the UDF closure the way every broadcast dim does, and each
  partition encodes its own documents in a ``mapInPandas`` pass —
  corpus bytes never shuffle, output is one thin (doc_id, n_tokens)
  row per document that feeds ``pack_sequences`` /
  ``decontaminate`` / the mixing planner directly.

At 100 TB the encode pass is embarrassingly parallel and the merges
table is a broadcast constant; nothing here scales with corpus size
except the map itself.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cae_polars_tools_spark.io import (
    SPREAD_HEAVY_BYTES,
    read_table,
    spread,
)
from cae_polars_tools_spark.plans.registry import register

Merge = tuple[bytes, bytes]


def train_bpe(texts: list[str], n_merges: int) -> list[Merge]:
    """Classic BPE training on UTF-8 bytes: repeatedly merge the most
    frequent adjacent token pair. Deterministic — ties break on the
    pair's byte value, so the same sample always yields the same
    merges regardless of dict order."""
    seqs = [[bytes([b]) for b in t.encode("utf-8")] for t in texts]
    merges: list[Merge] = []
    for _ in range(n_merges):
        counts: dict[Merge, int] = {}
        for seq in seqs:
            for a, b in zip(seq, seq[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < 2:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        for seq in seqs:
            i, out = 0, []
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seq[:] = out
    return merges


def bpe_encode_bytes(data: bytes, ranks: dict[Merge, int]) -> list[bytes]:
    """GPT-2-style greedy encode: start from single bytes, repeatedly
    apply the LOWEST-RANK merge present anywhere in the sequence
    (merging all its occurrences left-to-right) until no table pair
    remains."""
    seq = [bytes([b]) for b in data]
    while len(seq) > 1:
        best_rank, best_pair = None, None
        for pair in zip(seq, seq[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, pair
        if best_pair is None:
            break
        a, b = best_pair
        ab = a + b
        i, out = 0, []
        while i < len(seq):
            if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                out.append(ab)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out
    return seq


def bpe_merges_from_docs(
    docs: DataFrame,
    n_merges: int = 256,
    sample_rows: int = 2048,
    sample_fraction: float = 0.5,
    text_col: str = "text",
) -> list[Merge]:
    """Train merges on a bounded seeded sample of the corpus — the
    same no-count/no-sort sampling contract as
    ``train_ivf_centroids``: ``sample(fraction).limit(n)`` scans only
    the first ~n/fraction rows at any corpus size."""
    sample = [
        r[0]
        for r in docs.select(text_col)
        .sample(fraction=sample_fraction, seed=20240814)
        .limit(sample_rows)
        .collect()
    ]
    if not sample:
        sample = [r[0] for r in docs.select(text_col).limit(sample_rows).collect()]
    return train_bpe(sample, n_merges)


def tokenize_bpe(
    docs: DataFrame,
    merges: list[Merge],
    id_col: str = "doc_id",
    text_col: str = "text",
    with_tokens: bool = False,
) -> DataFrame:
    """Distributed byte-level BPE encode → ``(doc_id, n_tokens)``
    (plus the token array itself with ``with_tokens=True`` — counts
    only by default: the count is what packing/mixing consume, and the
    token arrays would be the only wide column in the output).

    Scale shape: merges ride in the closure (kilobytes — the
    broadcast-small-dim move), the encode is partition-local
    ``mapInPandas``, zero shuffle."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, counts, toks = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                enc = bpe_encode_bytes(str(text).encode("utf-8"), ranks)
                ids.append(int(doc_id))
                counts.append(len(enc))
                if with_tokens:
                    toks.append([t.decode("utf-8", "backslashreplace") for t in enc])
            out = {"doc_id": ids, "n_tokens": counts}
            if with_tokens:
                out["tokens"] = toks
            yield pd.DataFrame(out)

    schema = "doc_id long, n_tokens long" + (
        ", tokens array<string>" if with_tokens else ""
    )
    return docs.select(id_col, text_col).mapInPandas(gen, schema=schema)


# ---------------------------------------------------------------------------
# Corpus entry: a FIXED single-level merge table so DuckDB can verify
# the counts exactly. With merges whose sides are all single bytes, the
# greedy BPE loop degenerates to rank-ordered global left-to-right
# pair merging — which is exactly what nested REPLACE(..) with a
# distinct placeholder per merge computes, so
# n_tokens = length(text after replacements). The multi-level general
# path is covered by the seeded-training parity tests
# (tests/test_tokenizer.py), which check bpe_encode_bytes against an
# independent reference implementation.
# ---------------------------------------------------------------------------

FIXED_MERGES: list[Merge] = [
    (b"e", b" "),
    (b"t", b"h"),
    (b"s", b" "),
    (b"i", b"n"),
    (b"e", b"r"),
    (b"a", b"n"),
    (b"o", b"r"),
    (b"d", b" "),
]


def _fixed_merge_oracle() -> str:
    # PRECONDITION (asserted on the corpus by
    # tests/test_corpus_oracle.py::test_corpus_text_is_ascii): DuckDB
    # length()/replace() count CHARACTERS while the Spark side encodes
    # UTF-8 BYTES, and the chr(1)..chr(8) placeholders must not occur
    # in the input — both hold only for ASCII text free of control
    # chars 0x00-0x08. True for the synthetic corpus; a non-ASCII
    # documents table would hash-mismatch here, by design.
    expr = "text"
    for i, (a, b) in enumerate(FIXED_MERGES):
        pair = (a + b).decode()
        expr = f"replace({expr}, '{pair}', chr({i + 1}))"
    return f"""
        SELECT doc_id, CAST(length({expr}) AS BIGINT) AS n_tokens
        FROM documents
    """


@register(
    "bpe_token_counts",
    oracle=_fixed_merge_oracle(),
    tags=("tokenizer", "extension", "bpe"),
    window_rank=1,
)
def bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document byte-level BPE token counts under the fixed
    8-merge table — the real encode machinery (greedy lowest-rank
    loop), value-checked against a DuckDB nested-REPLACE oracle that
    is provably equivalent for single-byte-pair merge tables (see
    module comment). Counts feed ``pack_sequences`` unchanged.

    HEAVY spread tier: the greedy merge loop costs seconds per MB
    (interleaved A/B at sf0.1: 1.21 s at the 256 KiB text default vs
    0.75 s at 64 KiB ≈ the all-cores 0.71 floor)."""
    docs = spread(
        read_table(spark, sf_dir, "documents"),
        target_bytes=SPREAD_HEAVY_BYTES,
    )
    return tokenize_bpe(docs, FIXED_MERGES)

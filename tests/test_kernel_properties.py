"""Property-based checks for the round's pure-numpy kernels — the
components where a fixed example can miss an edge (tile boundaries,
duplicate ids, threshold ties)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


def _naive_pairs(ids, E, threshold):
    """O(n²) reference with the SAME dim-sequential accumulation."""
    E = E.astype(np.float64)
    n, d = E.shape
    out = set()
    norms = np.sqrt([(E[i] * E[i]).sum() for i in range(n)])
    for i in range(n):
        for j in range(n):
            if ids[i] >= ids[j]:
                continue
            acc = 0.0
            for k in range(d):
                acc += E[i, k] * E[j, k]
            if acc / (norms[i] * norms[j]) >= threshold:
                out.add((int(ids[i]), int(ids[j])))
    return out


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(2, 40),
    d=st.integers(2, 8),
    seed=st.integers(0, 10_000),
    threshold=st.sampled_from([-0.5, 0.0, 0.3, 0.8, 0.99]),
    tile=st.sampled_from([1, 3, 2048]),
)
def test_tiled_cosine_pairs_matches_naive(n, d, seed, threshold, tile):
    from cae_polars_tools_spark.operators.dedup import _tiled_cosine_pairs

    rng = np.random.default_rng(seed)
    E = rng.standard_normal((n, d)).astype(np.float32)
    ids = rng.permutation(n).astype(np.int64)
    got = _tiled_cosine_pairs(ids, E, threshold, tile_rows=tile)
    got_pairs = set(zip(got.vec_id_a.astype(int), got.vec_id_b.astype(int)))
    assert got_pairs == _naive_pairs(ids, E, threshold)
    # and a < b always holds
    assert (got.vec_id_a < got.vec_id_b).all()


def test_mix_sources_waterfill_fractions(spark):
    """Random weights/counts: the min-ratio source keeps everything and
    each source's kept count stays inside a 5-sigma Bernoulli band of
    its water-filling target."""
    import math

    from pyspark.sql import functions as F

    from cae_polars_tools_spark.operators.pipeline import mix_sources

    rng = np.random.default_rng(11)
    specs = {f"s{i}": (int(rng.integers(200, 1500)), float(rng.uniform(0.5, 4.0))) for i in range(5)}
    rows = []
    next_id = 0
    for src, (count, _w) in specs.items():
        for _ in range(count):
            rows.append((next_id, src))
            next_id += 1
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    wmap = {s: w for s, (_, w) in specs.items()}

    def weight_of(c):
        e = None
        for s_, w_ in wmap.items():
            e = F.when(c == s_, w_) if e is None else e.when(c == s_, w_)
        return e

    out = mix_sources(df, "source", weight_of, "doc_id")
    kept = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    K = min(c / w for c, w in specs.values())
    argmin = min(specs, key=lambda s: specs[s][0] / specs[s][1])
    assert kept[argmin] == specs[argmin][0]  # min-ratio source keeps all
    for s_, (c, w) in specs.items():
        target = min(1.0, w * K / c) * c
        sigma = math.sqrt(max(target * (1 - target / c), 1.0))
        assert abs(kept.get(s_, 0) - target) <= 5 * sigma + 1, (s_, kept.get(s_), target)


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(1, 120),
    n_keys=st.integers(1, 6),
    cap=st.integers(1, 5),
    salts=st.integers(1, 5),
    seed=st.integers(0, 1_000),
)
def test_presalt_cap_pigeonhole_model(n, n_keys, cap, salts, seed):
    """Algorithm-level property behind cap_per_key(presalt=…): for ANY
    deterministic row→salt assignment, pre-capping each (key, salt)
    group to the cap and then capping globally selects EXACTLY the
    global top-cap — because a globally-kept row has fewer than `cap`
    rows of its own salt ahead of it. The Spark tests pin the
    implementation on fixed data; this pins the pigeonhole argument
    across random shapes (hot keys, empty salts, cap > group size)."""
    import hashlib

    ids = list(range(n))
    key_of = {i: (i * 7 + seed) % n_keys for i in ids}
    rank_of = {
        i: hashlib.md5(f"{i}:{seed}".encode()).hexdigest() for i in ids
    }
    salt_of = {i: (i * 2654435761 + seed) % salts for i in ids}

    def topcap(rows, group_key):
        out = []
        groups = {}
        for i in sorted(rows, key=lambda i: (rank_of[i], i)):
            g = group_key(i)
            groups.setdefault(g, 0)
            if groups[g] < cap:
                groups[g] += 1
                out.append(i)
        return out

    plain = set(topcap(ids, lambda i: key_of[i]))
    precapped = topcap(ids, lambda i: (key_of[i], salt_of[i]))
    salted = set(topcap(precapped, lambda i: key_of[i]))
    assert salted == plain


@settings(max_examples=40, deadline=None)
@given(
    st.integers(0, 2**32 - 1),
    st.integers(1, 48),
    st.integers(0, 40),
)
def test_bpe_encode_lossless_and_parity(seed, n_texts, n_merges):
    """Property: for ANY trained merge table, the production greedy
    encoder (a) reconstructs the input bytes exactly and (b) agrees
    with a rescan-the-whole-table reference implementation."""
    import numpy as np

    from cae_polars_tools_spark.operators.tokenizer import (
        bpe_encode_bytes,
        train_bpe,
    )

    rng = np.random.default_rng(seed)
    alphabet = "abcde "
    texts = [
        "".join(rng.choice(list(alphabet), size=rng.integers(0, 60)))
        for _ in range(n_texts)
    ]
    merges = train_bpe(texts, n_merges)
    ranks = {m: i for i, m in enumerate(merges)}

    def reference(data):
        seq = [bytes([b]) for b in data]
        while True:
            cands = [
                (ranks[p], i)
                for i, p in enumerate(zip(seq, seq[1:]))
                if p in ranks
            ]
            if not cands:
                return seq
            a, b = merges[min(cands)[0]]
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seq = out

    for t in texts[:8]:
        data = t.encode()
        got = bpe_encode_bytes(data, ranks)
        assert b"".join(got) == data
        assert got == reference(data)


@settings(max_examples=60, deadline=None)
@given(
    st.integers(0, 2**32 - 1),
    st.integers(1, 40),
    st.booleans(),
)
def test_value_selection_matches_searchsorted_model(seed, n, descending):
    """Property: label-slice resolution over any sorted coordinate
    array equals the brute-force mask model (inclusive both ends,
    axis-order-following), and scalar labels resolve to a position
    holding exactly that value."""
    import numpy as np

    from cae_polars_tools_spark.sources.coordinates import (
        resolve_value_selection,
    )

    rng = np.random.default_rng(seed)
    coord = np.sort(rng.integers(-50, 50, size=n)).astype(np.float64)
    if descending:
        coord = coord[::-1].copy()
    lo, hi = sorted(rng.integers(-60, 60, size=2).tolist())
    # a single-element axis counts as ascending (pandas' convention),
    # so the descending slice(hi, lo) form only applies for n > 1
    sel = slice(hi, lo) if (descending and n > 1) else slice(lo, hi)
    out = resolve_value_selection(["x"], {"x": coord}, {"x": sel})["x"]
    mask = (coord >= lo) & (coord <= hi)
    pos = np.flatnonzero(mask)
    want = slice(int(pos[0]), int(pos[-1]) + 1) if len(pos) else slice(0, 0)
    assert out == want

    scalar = coord[int(rng.integers(0, n))]
    got = resolve_value_selection(["x"], {"x": coord}, {"x": float(scalar)})[
        "x"
    ]
    assert coord[got] == scalar

"""Property tests for the manifest primitives (pure Python — no
Spark): ref splitting/grouping round-trips, URI normalization, and
refcount-vacuum invariants over a model filesystem."""

from __future__ import annotations

import string

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cae_polars_tools_spark.manifest import (
    group_refs,
    split_ref,
    uri_to_ref,
)

_name = st.text(
    alphabet=string.ascii_lowercase + string.digits + "-_",
    min_size=1,
    max_size=8,
).filter(lambda s: not s.startswith(("_", ".")) and "=" not in s)

_pval = st.text(
    alphabet=string.ascii_lowercase + string.digits, min_size=0, max_size=4
)


@st.composite
def _ref(draw):
    """A root-relative ref: [birth dirs…] [k=v partition dirs…] file.
    Returns (ref, expected_base, expected_pcols)."""
    birth = draw(st.lists(_name, min_size=0, max_size=2))
    pcols = draw(st.lists(_name, min_size=0, max_size=2, unique=True))
    pvals = [draw(_pval) for _ in pcols]
    fname = draw(_name) + ".parquet"
    segs = birth + [f"{k}={v}" for k, v in zip(pcols, pvals)] + [fname]
    return "/".join(segs), "/".join(birth), pcols


@given(_ref())
@settings(max_examples=200)
def test_split_ref_recovers_base_and_partition_cols(r):
    ref, base, pcols = r
    got_base, got_pcols = split_ref(ref)
    assert got_base == base
    assert got_pcols == pcols


@given(st.lists(_ref(), min_size=1, max_size=6))
@settings(max_examples=100)
def test_group_refs_partitions_by_birth_dir_or_refuses(rs):
    refs = [r[0] for r in rs]
    layouts = {tuple(r[2]) for r in rs}
    if len(layouts) > 1:
        with pytest.raises(ValueError, match="mixed partition"):
            group_refs(refs)
        return
    groups, pcols = group_refs(refs)
    assert pcols == list(layouts.pop())
    # every ref lands in exactly one group, keyed by its birth dir
    assert sorted(x for g in groups.values() for x in g) == sorted(refs)
    for base, members in groups.items():
        assert all(split_ref(m)[0] == base for m in members)


@given(_ref())
@settings(max_examples=100)
def test_uri_to_ref_round_trips_file_uris(r):
    """input_file_name-style URIs (scheme, absolute path) normalize
    back to the root-relative ref regardless of root spelling."""
    ref, _base, _p = r
    root = "/data/my table"  # space: exercises percent-encoding
    from urllib.parse import quote

    uri = "file:" + quote(f"{root}/{ref}")
    assert uri_to_ref(uri, root) == ref
    assert uri_to_ref(f"{root}/{ref}", root) == ref  # plain path form
    assert uri_to_ref(uri, "file://" + root) == ref  # file:// root


def test_uri_to_ref_refuses_escapes():
    with pytest.raises(ValueError, match="outside"):
        uri_to_ref("/data/other/f.parquet", "/data/table")


from cae_polars_tools_spark.sources.zarr_format import ByteStore


class _MemStore(ByteStore):
    """Minimal in-memory ByteStore overriding the primitive methods
    the manifest machinery touches (the base class derives the rest —
    list_prefix_detail, put_if_absent, …) — lets the vacuum model
    test run without a filesystem."""

    def __init__(self):
        super().__init__("mem://x")
        self.objs: dict[str, bytes] = {}

    def get(self, key):
        return self.objs.get(key)

    def put(self, key, data):
        self.objs[key] = data

    def delete_prefix(self, prefix=""):
        if prefix in self.objs:
            del self.objs[prefix]
            return
        for k in [k for k in self.objs if k.startswith(prefix + "/")]:
            del self.objs[k]

    def list_prefix(self, prefix=""):
        names = set()
        p = prefix + "/" if prefix else ""
        for k in self.objs:
            if k.startswith(p):
                names.add(k[len(p):].split("/", 1)[0])
        return sorted(names)

    def size(self, key):
        d = self.objs.get(key)
        return None if d is None else len(d)


@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),  # version that owns each file
            st.booleans(),  # referenced by a retained manifest?
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(0, 3),
)
@settings(max_examples=150)
def test_vacuum_refcount_model(files, n_candidates):
    """Model check: after vacuum_refcount, (a) every referenced file
    survives, (b) no unreferenced file survives in a candidate dir,
    (c) a candidate dir is fully removed iff it kept nothing, else it
    is tombstoned, and (d) a second run is idempotent (no new
    removals/demotions reported)."""
    from cae_polars_tools_spark.manifest import (
        is_tombstoned,
        vacuum_refcount,
    )

    store = _MemStore()
    referenced = set()
    for i, (v, ref) in enumerate(files):
        key = f"v{v}/part-{i:03d}.parquet"
        store.put(key, b"x")
        if ref:
            referenced.add(key)
    candidates = [f"v{v}" for v in range(n_candidates)]
    for vd in candidates:
        store.put(f"{vd}/_MANIFEST.json", b"{}")

    stats = vacuum_refcount(store, referenced, candidates)
    for key in referenced:
        assert store.get(key) is not None, key  # (a)
    for vd in candidates:
        for key in [
            k for k in list(store.objs) if k.startswith(vd + "/")
        ]:
            if key.endswith(".parquet"):
                assert key in referenced  # (b)
        still_there = bool(store.list_prefix(vd))
        if vd in stats["removed"]:
            assert not still_there  # (c) fully gone
        elif still_there:
            assert is_tombstoned(store, vd)
            assert store.get(f"{vd}/_MANIFEST.json") is None
    again = vacuum_refcount(store, referenced, candidates)
    assert again["removed"] == [] or all(
        not store.list_prefix(v) for v in again["removed"]
    )
    assert again["demoted"] == []  # (d)


@given(
    st.dictionaries(
        st.text(string.ascii_lowercase, min_size=1, max_size=3),
        st.tuples(st.integers(-50, 50), st.integers(-50, 50)).map(
            lambda t: [min(t), max(t)]
        ),
        max_size=3,
    ),
    st.tuples(st.integers(-50, 50), st.integers(-50, 50)).map(
        lambda t: (min(t), max(t))
    ),
    st.lists(st.integers(-60, 60), min_size=0, max_size=20),
)
@settings(max_examples=200, deadline=None)
def test_refs_intersecting_never_prunes_a_containing_file(
    file_cols, batch_range, keys_in_file
):
    """Soundness model: a file whose recorded [min, max] on the probed
    column truly CONTAINS some batch key is never pruned — pruning may
    only drop files provably disjoint from the batch range."""
    from cae_polars_tools_spark.manifest import refs_intersecting

    col = "k"
    lo, hi = batch_range
    stats = {"f": {**file_cols}}
    if keys_in_file:
        fmin, fmax = min(keys_in_file), max(keys_in_file)
        stats["f"][col] = [fmin, fmax]
        contains_hit = any(lo <= v <= hi for v in keys_in_file)
    else:
        stats["f"].pop(col, None)
        contains_hit = None
    survivors = refs_intersecting(stats, ["f"], {col: (lo, hi)})
    if contains_hit:
        assert survivors == ["f"]
    if contains_hit is None:
        # no recorded stats on the probed column: always a candidate
        assert survivors == ["f"]


# -- footer-stats typed-bounds soundness (round 15) --------------------------
#
# Timestamp/date keys record as epoch-micros / epoch-days INTS in the
# manifest (parquet_footer_stats via _stat_bounds). The soundness
# contract mirrors the float-exclusion rule: every value physically in
# the file must fall inside the recorded [min, max] after the SAME
# conversion the merge probe applies (unix_micros / unix_date), and
# wall-clock (isAdjustedToUTC=false) timestamps must record NOTHING —
# their probe conversion would be session-timezone-dependent.


@given(
    st.lists(
        st.integers(-(2**52), 2**52),  # epoch micros, ±~142 years
        min_size=1,
        max_size=20,
    ),
    st.sampled_from(["us", "ms", "ns"]),
    st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_footer_stats_timestamp_bounds_contain_all_values(
    micros, unit, utc
):
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from cae_polars_tools_spark.manifest import parquet_footer_stats
    from cae_polars_tools_spark.sources.zarr_format import LocalByteStore

    scale = {"us": 1, "ms": 1000, "ns": 1}[unit]
    raw = [m // scale for m in micros]
    if unit == "ns":
        raw = [m * 1000 for m in micros]
    arr = pa.array(raw, pa.int64()).cast(
        pa.timestamp(unit, tz="UTC" if utc else None)
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.table({"ts": arr}), f"{d}/f.parquet")
        _, stats = parquet_footer_stats(LocalByteStore(d), "f.parquet")
    if not utc:
        # wall-clock semantics: no stat, always a candidate
        assert "ts" not in stats
        return
    lo, hi = stats["ts"]
    assert isinstance(lo, int) and isinstance(hi, int)
    true_micros = [
        r * {"us": 1, "ms": 1000}.get(unit, 1) if unit != "ns" else r // 1000
        for r in raw
    ]
    if unit == "ns":
        # nanos floor the min and ceil the max — the box still
        # contains every truncated-to-micros value
        assert lo <= min(true_micros) and hi >= max(true_micros)
    else:
        assert lo == min(true_micros) and hi == max(true_micros)
    for v in true_micros:
        assert lo <= v <= hi


@given(st.lists(st.integers(-100_000, 100_000), min_size=1, max_size=20))
@settings(max_examples=40, deadline=None)
def test_footer_stats_date_bounds_contain_all_values(days):
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from cae_polars_tools_spark.manifest import parquet_footer_stats
    from cae_polars_tools_spark.sources.zarr_format import LocalByteStore

    arr = pa.array(days, pa.int32()).cast(pa.date32())
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.table({"d": arr}), f"{d}/f.parquet")
        _, stats = parquet_footer_stats(LocalByteStore(d), "f.parquet")
    lo, hi = stats["d"]
    assert lo == min(days) and hi == max(days)


def test_id_range_of_dates_and_datetimes():
    """Date id lists convert to epoch days (matching the manifest's
    encoding); datetime lists return None — their epoch conversion is
    session-timezone-dependent, so the takedown stays unpruned rather
    than risking a silent miss."""
    import datetime as dt

    from cae_polars_tools_spark.manifest import id_range_of

    assert id_range_of(
        [dt.date(1970, 1, 3), dt.date(1969, 12, 31), None]
    ) == (-1, 2)
    assert id_range_of([dt.datetime(2024, 1, 1, 12)]) is None
    assert id_range_of([dt.date(2024, 1, 1), 5]) is None  # mixed


@given(
    st.lists(
        st.integers(-(10**12), 10**12),  # unscaled values
        min_size=1,
        max_size=20,
    ),
    st.integers(0, 6),  # scale
)
@settings(max_examples=40, deadline=None)
def test_footer_stats_decimal_bounds_contain_all_values(unscaled, scale):
    """Decimal stats soundness: the recorded scale-tagged unscaled-int
    box contains every value physically in the file (pyarrow writes
    decimal128 as big-endian FLBA; the Spark-side INT32/INT64 physical
    encodings are pinned in test_table_scale_meta)."""
    import decimal
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from cae_polars_tools_spark.manifest import parquet_footer_stats
    from cae_polars_tools_spark.sources.zarr_format import LocalByteStore

    vals = [
        decimal.Decimal(u).scaleb(-scale).quantize(
            decimal.Decimal(1).scaleb(-scale)
        )
        for u in unscaled
    ]
    arr = pa.array(vals, pa.decimal128(20, scale))
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.table({"amt": arr}), f"{d}/f.parquet")
        _, stats = parquet_footer_stats(LocalByteStore(d), "f.parquet")
    lo, hi, tag = stats["amt"]
    assert tag == {"t": "dec", "s": scale}
    assert lo == min(unscaled) and hi == max(unscaled)
    for u in unscaled:
        assert lo <= u <= hi


def test_refs_intersecting_tag_mismatch_stays_candidate():
    """A tagged recorded range never prunes against an untagged or
    differently-tagged probe (and vice versa) — encoding drift
    degrades to candidacy."""
    from cae_polars_tools_spark.manifest import refs_intersecting

    stats = {"f": {"amt": [100, 200, {"t": "dec", "s": 2}]}}
    # identical tag, disjoint range: prunes
    assert refs_intersecting(
        stats, ["f"], {"amt": (300, 400, {"t": "dec", "s": 2})}
    ) == []
    # identical tag, overlapping: candidate
    assert refs_intersecting(
        stats, ["f"], {"amt": (150, 400, {"t": "dec", "s": 2})}
    ) == ["f"]
    # scale drift: candidate even though ints are disjoint
    assert refs_intersecting(
        stats, ["f"], {"amt": (300, 400, {"t": "dec", "s": 3})}
    ) == ["f"]
    # untagged probe vs tagged stat: candidate
    assert refs_intersecting(stats, ["f"], {"amt": (300, 400)}) == ["f"]
    # tagged probe vs untagged stat: candidate
    assert refs_intersecting(
        {"f": {"amt": [100, 200]}},
        ["f"],
        {"amt": (300, 400, {"t": "dec", "s": 2})},
    ) == ["f"]

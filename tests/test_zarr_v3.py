"""Zarr v3 format support: the same scan surface (long format, dims,
selection pushdown, info, data source) over a v3 store — reference
parity, since its zarr-python dependency reads both formats."""

from __future__ import annotations

import json

import numpy as np
import pytest


@pytest.fixture(scope="module")
def v3_store(tmp_path_factory):
    from cae_polars_tools_spark.sources.zarr_v3 import write_group_v3

    root = str(tmp_path_factory.mktemp("v3") / "climate_v3.zarr")
    i, j = np.indices((6, 4))
    write_group_v3(
        root,
        arrays={"temperature": (i * 10 + j).astype(np.float32)},
        dims={"temperature": ("time", "lat")},
        coords={
            "time": np.arange(6, dtype=np.int32),
            "lat": (30 + np.arange(4) * 0.5).astype(np.float32),
        },
        chunks={"temperature": (2, 3)},
    )
    return root


def test_v3_dispatch_and_metadata(v3_store):
    from cae_polars_tools_spark.sources.zarr_format import open_group
    from cae_polars_tools_spark.sources.zarr_v3 import ZarrV3Group

    g = open_group(v3_store)
    assert isinstance(g, ZarrV3Group)
    assert sorted(g.array_names()) == ["lat", "temperature", "time"]
    arr = g.get_array("temperature")
    assert arr.shape == (6, 4) and arr.chunks == (2, 3)
    assert arr.attrs["_ARRAY_DIMENSIONS"] == ["time", "lat"]
    assert arr.dtype == np.dtype("<f4")


def test_v3_chunk_reads_and_indexing(v3_store):
    from cae_polars_tools_spark.sources.zarr_format import open_group

    arr = open_group(v3_store).get_array("temperature")
    full = arr[(slice(None), slice(None))]
    i, j = np.indices((6, 4))
    np.testing.assert_array_equal(full, (i * 10 + j).astype(np.float32))
    # int drops the dim; stepped slice honored; chunk pruning exercised
    np.testing.assert_array_equal(arr[(3, slice(0, 4, 2))], [30.0, 32.0])


def test_v3_scan_long_format(spark, v3_store):
    from cae_polars_tools_spark.sources.zarr_scan import scan_data

    df = scan_data(spark, v3_store, "temperature", chunk_size=7)
    rows = df.orderBy("time", "lat").collect()
    assert len(rows) == 24
    assert rows[0]["time"] == 0 and rows[0]["lat"] == 30.0 and rows[0]["value"] == 0.0
    assert rows[-1]["value"] == 53.0
    assert dict(df.dtypes) == {"time": "int", "lat": "float", "value": "float"}


def test_v3_info(v3_store):
    from cae_polars_tools_spark.sources.zarr_scan import get_zarr_data_info

    info = get_zarr_data_info(v3_store)
    t = info["arrays"]["temperature"]
    assert t["dimensions"] == ["time", "lat"]
    assert t["shape"] == (6, 4)


def test_v3_datasource_filter_pushdown(spark, v3_store):
    from cae_polars_tools_spark.sources.zarr_scan import register_zarr_source

    register_zarr_source(spark)
    df = (
        spark.read.format("zarr")
        .option("array", "temperature")
        .load(v3_store)
        .filter("time >= 4 AND lat <= 30.5")
    )
    rows = {(r["time"], r["lat"]): r["value"] for r in df.collect()}
    assert rows == {
        (4, 30.0): 40.0,
        (4, 30.5): 41.0,
        (5, 30.0): 50.0,
        (5, 30.5): 51.0,
    }


def test_v3_uncompressed_and_fill_value(tmp_path):
    from cae_polars_tools_spark.sources.zarr_format import open_group
    from cae_polars_tools_spark.sources.zarr_v3 import write_group_v3

    root = str(tmp_path / "raw.zarr")
    write_group_v3(
        root,
        arrays={"x": np.arange(5, dtype=np.int64)},
        gzip_level=None,
    )
    arr = open_group(root).get_array("x")
    np.testing.assert_array_equal(arr[(slice(None),)], np.arange(5))


def test_v3_nan_fill_value_spelling(tmp_path):
    """The v3 JSON 'NaN' spelling for float fill values decodes to a
    real NaN for missing chunks."""
    from cae_polars_tools_spark.sources.zarr_format import open_group
    from cae_polars_tools_spark.sources.zarr_v3 import write_group_v3

    root = str(tmp_path / "nan.zarr")
    write_group_v3(root, arrays={"x": np.zeros(4, dtype=np.float64)})
    meta_path = f"{root}/x/zarr.json"
    meta = json.load(open(meta_path))
    meta["fill_value"] = "NaN"
    json.dump(meta, open(meta_path, "w"))
    import os

    os.remove(f"{root}/x/c/0")  # missing chunk → fill
    arr = open_group(root).get_array("x")
    assert np.isnan(arr[(slice(None),)]).all()


def test_v3_unsupported_codec_error(tmp_path):
    from cae_polars_tools_spark.sources.zarr_format import open_group
    from cae_polars_tools_spark.sources.zarr_v3 import write_group_v3

    root = str(tmp_path / "zstd.zarr")
    write_group_v3(root, arrays={"x": np.arange(4, dtype=np.int32)})
    meta_path = f"{root}/x/zarr.json"
    meta = json.load(open(meta_path))
    meta["codecs"] = [
        {"name": "bytes", "configuration": {"endian": "little"}},
        {"name": "zstd", "configuration": {"level": 3}},
    ]
    json.dump(meta, open(meta_path, "w"))
    arr = open_group(root).get_array("x")
    with pytest.raises(ValueError, match="zstd"):
        arr[(slice(None),)]


@pytest.fixture()
def sharded_store(tmp_path):
    """12×8 float32 array, inner chunks (2, 2), shards (4, 4) → a 3×2
    shard grid of 2×2 inner chunks each; row 0..1 × col 0..1 is
    all-zero so its inner chunk is elided (2^64-1 index sentinel)."""
    from cae_polars_tools_spark.sources.zarr_v3 import write_group_v3

    i, j = np.indices((12, 8))
    data = (i * 10 + j).astype(np.float32)
    data[0:2, 0:2] = 0  # elided all-fill inner chunk
    root = str(tmp_path / "sharded.zarr")
    write_group_v3(
        root,
        arrays={"temperature": data},
        dims={"temperature": ("time", "lat")},
        chunks={"temperature": (2, 2)},
        shards={"temperature": (4, 4)},
    )
    return root, data


def test_v3_sharding_roundtrip_and_inner_chunk_grid(sharded_store):
    """Sharded arrays read back exactly, expose the INNER chunk grid to
    the pruning machinery, and honor the elided-chunk fill sentinel."""
    from cae_polars_tools_spark.sources.zarr_format import open_group

    root, data = sharded_store
    arr = open_group(root).get_array("temperature")
    assert arr.chunks == (2, 2)  # inner, not shard
    assert arr.shard_chunks == (4, 4)
    assert arr.nchunks == (6, 4)
    np.testing.assert_array_equal(arr[(slice(None), slice(None))], data)
    # stored object count = shard grid (3×2), not inner grid (6×4)
    import os

    files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(f"{root}/temperature/c")
        for f in fs
    ]
    assert len(files) == 6


def test_v3_sharding_partial_reads_never_download_whole_shard(sharded_store):
    """An indexed read touches only ranged GETs (index + one inner
    chunk) on only the shards the selection intersects — never a
    whole-shard ``get``. This is the sharding scale story: on object
    storage a point read is two small ranged requests."""
    from cae_polars_tools_spark.sources.zarr_format import open_group

    root, data = sharded_store
    g = open_group(root)
    arr = g.get_array("temperature")
    full_gets: list[str] = []
    ranged: list[tuple[str, int, int]] = []
    inner_get, inner_range = arr.store.get, arr.store.get_range
    arr.store.get = lambda k: (full_gets.append(k) or inner_get(k))
    arr.store.get_range = lambda k, o, n: (
        ranged.append((k, o, n)) or inner_range(k, o, n)
    )
    np.testing.assert_array_equal(arr[(5, 3)], data[5, 3])
    assert full_gets == []  # no whole-shard download
    keys = {k for k, _, _ in ranged}
    assert keys == {"temperature/c/1/0"}  # only the intersecting shard
    # index read (suffix range) + one inner-chunk read
    assert any(o < 0 for _, o, _ in ranged)
    assert len(ranged) == 2


def test_v3_sharding_missing_shard_object_fills(sharded_store):
    import os

    from cae_polars_tools_spark.sources.zarr_format import open_group

    root, data = sharded_store
    os.remove(f"{root}/temperature/c/2/1")
    arr = open_group(root).get_array("temperature")
    expect = data.copy()
    expect[8:12, 4:8] = 0  # whole missing shard → fill
    np.testing.assert_array_equal(arr[(slice(None), slice(None))], expect)


def test_v3_shard_index_corruption_detected(sharded_store):
    """The shard index checksum is ALWAYS verified (pure-Python
    fallback when no C crc32c) — a flipped index byte raises rather
    than mis-addressing chunk bytes."""
    from cae_polars_tools_spark.sources.zarr_format import open_group

    root, _ = sharded_store
    path = f"{root}/temperature/c/0/0"
    blob = bytearray(open(path, "rb").read())
    blob[-10] ^= 0xFF  # inside the uint64 index, before the crc
    open(path, "wb").write(bytes(blob))
    arr = open_group(root).get_array("temperature")
    with pytest.raises(ValueError, match="crc32c checksum mismatch"):
        arr[(0, 0)]


def test_v3_sharding_index_location_start(tmp_path):
    """index_location='start' shards (index before the chunk bytes,
    offsets still shard-absolute) read correctly."""
    import struct

    from cae_polars_tools_spark.sources.zarr_format import open_group
    from cae_polars_tools_spark.sources.zarr_v3 import _crc32c_value

    root = tmp_path / "start.zarr"
    (root).mkdir()
    (root / "zarr.json").write_text(
        json.dumps({"zarr_format": 3, "node_type": "group", "attributes": {}})
    )
    (root / "x").mkdir()
    (root / "x" / "zarr.json").write_text(
        json.dumps(
            {
                "zarr_format": 3,
                "node_type": "array",
                "shape": [4],
                "data_type": "int32",
                "chunk_grid": {
                    "name": "regular",
                    "configuration": {"chunk_shape": [4]},
                },
                "chunk_key_encoding": {
                    "name": "default",
                    "configuration": {"separator": "/"},
                },
                "fill_value": 0,
                "codecs": [
                    {
                        "name": "sharding_indexed",
                        "configuration": {
                            "chunk_shape": [2],
                            "codecs": [
                                {
                                    "name": "bytes",
                                    "configuration": {"endian": "little"},
                                }
                            ],
                            "index_codecs": [
                                {
                                    "name": "bytes",
                                    "configuration": {"endian": "little"},
                                },
                                {"name": "crc32c"},
                            ],
                            "index_location": "start",
                        },
                    }
                ],
                "attributes": {},
            }
        )
    )
    data = np.array([7, 8, 9, 10], dtype="<i4")
    idx_nbytes = 16 * 2 + 4
    chunk0, chunk1 = data[:2].tobytes(), data[2:].tobytes()
    index = struct.pack(
        "<4Q", idx_nbytes, len(chunk0), idx_nbytes + len(chunk0), len(chunk1)
    )
    index += _crc32c_value(index).to_bytes(4, "little")
    (root / "x" / "c").mkdir()
    (root / "x" / "c" / "0").write_bytes(index + chunk0 + chunk1)
    arr = open_group(str(root)).get_array("x")
    np.testing.assert_array_equal(arr[(slice(None),)], data)


def test_v3_sharding_scan_long_format(spark, sharded_store):
    """The Spark scan surface works unchanged over a sharded store —
    partitions align to inner chunks, values match the dense array."""
    from cae_polars_tools_spark.sources.zarr_scan import scan_data

    root, data = sharded_store
    df = scan_data(spark, root, "temperature")
    rows = df.orderBy("time", "lat").collect()
    assert len(rows) == data.size
    got = np.array([r["value"] for r in rows]).reshape(data.shape)
    np.testing.assert_array_equal(got, data)


def test_v3_transpose_codec_roundtrip(tmp_path):
    """transpose array→array codec: stored bytes are the permuted
    layout; the reader inverse-permutes back."""
    from cae_polars_tools_spark.sources.zarr_format import open_group

    root = tmp_path / "t.zarr"
    root.mkdir()
    (root / "zarr.json").write_text(
        json.dumps({"zarr_format": 3, "node_type": "group", "attributes": {}})
    )
    (root / "x").mkdir()
    (root / "x" / "zarr.json").write_text(
        json.dumps(
            {
                "zarr_format": 3,
                "node_type": "array",
                "shape": [2, 3],
                "data_type": "int32",
                "chunk_grid": {
                    "name": "regular",
                    "configuration": {"chunk_shape": [2, 3]},
                },
                "chunk_key_encoding": {
                    "name": "default",
                    "configuration": {"separator": "/"},
                },
                "fill_value": 0,
                "codecs": [
                    {"name": "transpose", "configuration": {"order": [1, 0]}},
                    {"name": "bytes", "configuration": {"endian": "little"}},
                ],
                "attributes": {},
            }
        )
    )
    data = np.arange(6, dtype="<i4").reshape(2, 3)
    (root / "x" / "c").mkdir()
    (root / "x" / "c" / "0").mkdir()
    (root / "x" / "c" / "0" / "0").write_bytes(
        np.ascontiguousarray(data.T).tobytes()
    )
    arr = open_group(str(root)).get_array("x")
    np.testing.assert_array_equal(arr[(slice(None), slice(None))], data)


def test_v3_crc32c_verified_when_impl_available(tmp_path, monkeypatch):
    """With a CRC-32C implementation available the trailing checksum is
    actually checked: a corrupted chunk raises, an intact one passes.
    (The env has no crc32c package, so the impl is injected.)"""
    import struct as _struct
    import zlib

    import cae_polars_tools_spark.sources.zarr_v3 as v3
    from cae_polars_tools_spark.sources.zarr_format import open_group
    from cae_polars_tools_spark.sources.zarr_v3 import write_group_v3

    # deterministic stand-in CRC (NOT real crc32c — both sides use it)
    fake = lambda b: zlib.crc32(bytes(b), 123) & 0xFFFFFFFF  # noqa: E731
    monkeypatch.setattr(v3, "_CRC32C", fake)

    root = str(tmp_path / "crc.zarr")
    data = np.arange(4, dtype=np.int32)
    write_group_v3(root, arrays={"x": data}, gzip_level=None)
    meta_path = f"{root}/x/zarr.json"
    meta = json.load(open(meta_path))
    meta["codecs"] = [
        {"name": "bytes", "configuration": {"endian": "little"}},
        {"name": "crc32c"},
    ]
    json.dump(meta, open(meta_path, "w"))
    body = open(f"{root}/x/c/0", "rb").read()
    with open(f"{root}/x/c/0", "wb") as f:
        f.write(body + _struct.pack("<I", fake(body)))
    arr = open_group(root).get_array("x")
    np.testing.assert_array_equal(arr[(slice(None),)], data)

    # corrupt one payload byte; stored checksum now mismatches
    with open(f"{root}/x/c/0", "wb") as f:
        f.write(bytes([body[0] ^ 0xFF]) + body[1:] + _struct.pack("<I", fake(body)))
    with pytest.raises(ValueError, match="crc32c checksum mismatch"):
        arr[(slice(None),)]


def test_v3_crc32c_pure_fallback_small_vs_large(tmp_path, monkeypatch):
    """Without a C CRC-32C implementation, small chunk bodies are still
    verified by the pure-Python fallback (garbage checksum raises);
    bodies above the pure-Python size limit are stripped unverified
    rather than paying ~1 s/MB of Python loop."""
    import cae_polars_tools_spark.sources.zarr_v3 as v3
    from cae_polars_tools_spark.sources.zarr_format import open_group
    from cae_polars_tools_spark.sources.zarr_v3 import write_group_v3

    monkeypatch.setattr(v3, "_CRC32C", None)

    def build(name, data):
        root = str(tmp_path / name)
        write_group_v3(
            root,
            arrays={"x": data},
            gzip_level=None,
            chunks={"x": data.shape},
        )
        meta_path = f"{root}/x/zarr.json"
        meta = json.load(open(meta_path))
        meta["codecs"] = [
            {"name": "bytes", "configuration": {"endian": "little"}},
            {"name": "crc32c"},
        ]
        json.dump(meta, open(meta_path, "w"))
        body = open(f"{root}/x/c/0", "rb").read()
        with open(f"{root}/x/c/0", "wb") as f:
            f.write(body + b"\x00\x00\x00\x00")  # garbage checksum
        return open_group(root).get_array("x")

    small = build("small.zarr", np.arange(4, dtype=np.int32))
    with pytest.raises(ValueError, match="crc32c checksum mismatch"):
        small[(slice(None),)]

    big_data = np.ones(v3._PURE_CRC_BODY_LIMIT + 8, dtype=np.int8)
    big = build("big.zarr", big_data)
    np.testing.assert_array_equal(big[(slice(None),)], big_data)


def test_v3_crc32c_pure_matches_known_vector():
    """The table-driven fallback IS CRC-32C (Castagnoli): RFC 3720's
    canonical test vector."""
    from cae_polars_tools_spark.sources.zarr_v3 import _crc32c_pure

    assert _crc32c_pure(b"123456789") == 0xE3069283


def test_v3_blosc_chunk_decodes_through_v2_ladder(tmp_path):
    """A v3 blosc chunk routes through the same numcodecs-preferred /
    pure-Python-fallback ladder as v2 (memcpyed frame decodes without
    any native codec)."""
    from cae_polars_tools_spark.sources.blosc_codec import blosc_compress_memcpy
    from cae_polars_tools_spark.sources.zarr_format import open_group
    from cae_polars_tools_spark.sources.zarr_v3 import write_group_v3

    root = str(tmp_path / "blosc.zarr")
    data = np.arange(4, dtype=np.int32)
    write_group_v3(root, arrays={"x": data}, gzip_level=None)
    meta_path = f"{root}/x/zarr.json"
    meta = json.load(open(meta_path))
    meta["codecs"] = [
        {"name": "bytes", "configuration": {"endian": "little"}},
        {
            "name": "blosc",
            "configuration": {"cname": "lz4", "typesize": 4, "shuffle": "noshuffle"},
        },
    ]
    json.dump(meta, open(meta_path, "w"))
    body = open(f"{root}/x/c/0", "rb").read()
    with open(f"{root}/x/c/0", "wb") as f:
        f.write(blosc_compress_memcpy(body, typesize=4))
    arr = open_group(root).get_array("x")
    np.testing.assert_array_equal(arr[(slice(None),)], data)


def test_v3_sharding_hostile_bytes_fuzz(sharded_store):
    """Hostile-bytes guard for the shard path: truncating or
    corrupting a shard OBJECT (whose trailing index is parsed as
    untrusted bytes: offsets, sizes, checksum) either still reads or
    raises ValueError — never struct.error / IndexError /
    zlib-internal errors, and never returns silently-wrong offsets
    (the index checksum is force-verified)."""
    import os

    from cae_polars_tools_spark.sources.zarr_format import open_group

    root, data = sharded_store
    shard_path = f"{root}/temperature/c/0/0"
    orig = open(shard_path, "rb").read()

    def check(payload: bytes):
        with open(shard_path, "wb") as fh:
            fh.write(payload)
        arr = open_group(root).get_array("temperature")  # fresh LRU
        try:
            arr[(slice(0, 4), slice(0, 4))]
        except ValueError:
            pass

    try:
        # every truncation in the index region + a spread of body cuts
        for cut in list(range(max(0, len(orig) - 70), len(orig))) + list(
            range(0, len(orig), 37)
        ):
            check(orig[:cut])
        # seeded random corruption across the whole object
        rng = np.random.default_rng(31)
        for _ in range(200):
            d = bytearray(orig)
            for _ in range(int(rng.integers(1, 4))):
                d[int(rng.integers(0, len(d)))] = int(rng.integers(0, 256))
            check(bytes(d))
        # index-region corruption specifically must fail the FORCED
        # checksum (or length) check, not decode garbage offsets
        d = bytearray(orig)
        d[-20] ^= 0xFF  # inside the 16B/chunk offset table
        with open(shard_path, "wb") as fh:
            fh.write(bytes(d))
        arr = open_group(root).get_array("temperature")
        with pytest.raises(ValueError):
            arr[(slice(0, 4), slice(0, 4))]
    finally:
        with open(shard_path, "wb") as fh:
            fh.write(orig)
    # store restored: reads are exact again
    arr = open_group(root).get_array("temperature")
    np.testing.assert_array_equal(
        arr[(slice(0, 4), slice(0, 4))], data[0:4, 0:4]
    )

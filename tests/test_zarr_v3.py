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


def test_v3_sharding_codec_error_names_codec_and_workaround(tmp_path):
    from cae_polars_tools_spark.sources.zarr_format import open_group
    from cae_polars_tools_spark.sources.zarr_v3 import write_group_v3

    root = str(tmp_path / "shard.zarr")
    write_group_v3(root, arrays={"x": np.arange(4, dtype=np.int32)})
    meta_path = f"{root}/x/zarr.json"
    meta = json.load(open(meta_path))
    meta["codecs"] = [
        {
            "name": "sharding_indexed",
            "configuration": {"chunk_shape": [2]},
        }
    ]
    json.dump(meta, open(meta_path, "w"))
    arr = open_group(root).get_array("x")
    with pytest.raises(ValueError, match="sharding_indexed") as ei:
        arr[(slice(None),)]
    assert "zarr" in str(ei.value)  # names a workaround


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


def test_v3_crc32c_skipped_without_impl(tmp_path, monkeypatch):
    import cae_polars_tools_spark.sources.zarr_v3 as v3
    from cae_polars_tools_spark.sources.zarr_format import open_group
    from cae_polars_tools_spark.sources.zarr_v3 import write_group_v3

    monkeypatch.setattr(v3, "_CRC32C", None)
    root = str(tmp_path / "crcskip.zarr")
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
        f.write(body + b"\x00\x00\x00\x00")  # garbage checksum: skipped
    arr = open_group(root).get_array("x")
    np.testing.assert_array_equal(arr[(slice(None),)], data)


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

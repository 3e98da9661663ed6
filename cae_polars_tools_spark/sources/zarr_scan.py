"""Top-level zarr scan API (reference zarr_scanner.py:73-273).

``scan_data`` mirrors the reference entry point: one array → one
DataFrame; ``array_name=None`` → dict of DataFrames for every array.
``get_zarr_data_info`` is the metadata-only fast path (no data read,
no Spark job). ``register_zarr_source`` enables
``spark.read.format("zarr")``.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from cae_polars_tools_spark.sources.zarr_reader import (
    DEFAULT_CHUNK_SIZE,
    ZarrDataReader,
)
from cae_polars_tools_spark.sources.zarr_store import ZarrStore


def scan_data(
    spark: SparkSession,
    store_path: str,
    array_name: str | None = None,
    storage_options: dict | None = None,
    group: str | None = None,
    consolidated: bool | None = None,
    select_dims: dict[str, Any] | None = None,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    streaming: bool = True,
    select_ranges: dict[str, Any] | None = None,
) -> DataFrame | dict[str, DataFrame]:
    """Scan zarr array(s) into long-format DataFrame(s).

    Signature follows the reference ``scan_data`` (zarr_scanner.py:73-96)
    with a leading SparkSession. ``select_dims`` is positional
    (int / slice / list[int]); an int selection drops the dimension
    (SURVEY §2.3). ``select_ranges`` selects by coordinate VALUE —
    ``{"time": slice("2020-01-01", "2020-12-31"), "lat": slice(30, 60)}``
    — the label surface the reference's docs promise
    (zarr_scanner.py:41-44, docs/user_guide/reading_data.md:80-88);
    labels resolve on the driver against the 1-D coordinate arrays and
    reuse the positional path (slices inclusive both ends, scalars drop
    the dim, see ``coordinates.resolve_value_selection``).
    ``streaming=False`` reads eagerly on the driver (small arrays
    only); default is the distributed partitioned scan.
    """
    reader = ZarrDataReader(
        spark,
        store_path,
        storage_options=storage_options,
        group=group,
        consolidated=consolidated,
        chunk_size=chunk_size,
    )
    if array_name is not None:
        return reader.read_array(
            array_name,
            select_dims=select_dims,
            streaming=streaming,
            select_ranges=select_ranges,
        )
    return {
        name: reader.read_array(
            name,
            select_dims=select_dims,
            streaming=streaming,
            select_ranges=select_ranges,
        )
        for name in reader.list_arrays()
    }


def get_zarr_data_info(
    store_path: str,
    storage_options: dict | None = None,
    group: str | None = None,
    consolidated: bool | None = None,
) -> dict[str, Any]:
    """Metadata-only store inspection (reference zarr_scanner.py:186-268):
    ``{store_path, group, arrays: {name: info}}``; reads no array data
    and launches no Spark job."""
    store = ZarrStore(
        store_path,
        storage_options=storage_options,
        group=group,
        consolidated=consolidated,
    )
    return {
        "store_path": store_path,
        "group": group,
        "arrays": {
            name: store.get_array_info(name) for name in store.list_arrays()
        },
    }


PUSHDOWN_CONF = "spark.sql.python.filterPushdown.enabled"

# (session, format) → registered variant name. Registration is an
# idempotent JVM RPC, but repeated per-query registration showed up as
# fixed overhead on the smallest data-source scans (every RPC's
# latency is multiplied under host load); cache per session and skip
# the round-trip when the same variant is already in place.
_REGISTERED: dict[tuple[str, str], str] = {}


def register_cached(spark: SparkSession, cls) -> None:
    """``spark.dataSource.register(cls)``, skipped when this session
    already registered the same variant under the same format name
    (shared by the zarr and netcdf3 sources)."""
    try:
        session_key = spark.sparkContext.applicationId + str(id(spark))
    except Exception:
        session_key = str(id(spark))
    key = (session_key, cls.name())
    if _REGISTERED.get(key) == cls.__name__:
        return
    spark.dataSource.register(cls)
    _REGISTERED[key] = cls.__name__


def register_zarr_source(spark: SparkSession) -> None:
    """Enable ``spark.read.format("zarr")`` for this session.

    Spark refuses to initialize a Python data source reader that
    defines ``pushFilters`` while ``spark.sql.python.filterPushdown.enabled``
    is false (``[DATA_SOURCE_PUSHDOWN_DISABLED]``) — and false is
    Spark's default. The variant is therefore chosen from the
    session's conf at registration time: pushdown-capable when the
    conf is on, a no-``pushFilters`` reader (same scan, filters
    evaluated post-scan by Spark) when it is off, so ``.load()``
    works either way. Re-register after flipping the conf to switch
    variants.
    """
    from cae_polars_tools_spark.sources.zarr_datasource import (
        ZarrDataSource,
        ZarrDataSourceNoPushdown,
    )

    try:
        enabled = str(spark.conf.get(PUSHDOWN_CONF, "false")).lower() == "true"
    except Exception:
        enabled = False
    register_cached(
        spark, ZarrDataSource if enabled else ZarrDataSourceNoPushdown
    )

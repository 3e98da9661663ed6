"""Spark-vs-DuckDB comparison mirroring the driver's correctness gate:
row count + schema-insensitive, order-insensitive value comparison with
columns sorted by name."""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con.execute(sql).df()


def _norm_cell(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Exact repr: we claim bit-identical doubles across engines.
        return repr(v)
    if isinstance(v, (pd.Timestamp,)):
        return v.isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def canonicalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows, key=repr)


def assert_frames_match(spark_df, oracle_df: pd.DataFrame, name: str = "") -> None:
    sdf = spark_df.toPandas()
    assert sorted(sdf.columns) == sorted(oracle_df.columns), (
        f"{name}: column names differ: spark={sorted(sdf.columns)} "
        f"oracle={sorted(oracle_df.columns)}"
    )
    assert len(sdf) == len(oracle_df), (
        f"{name}: row count differs: spark={len(sdf)} oracle={len(oracle_df)}"
    )
    s_rows = canonicalize(sdf)
    o_rows = canonicalize(oracle_df)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first 3: {mismatches[:3]}"
    )

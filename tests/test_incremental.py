"""Incremental aggregate maintenance: merge algebra vs full recompute,
insert/update paths through the CoW state refresh, measure validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cae_polars_tools_spark.operators.incremental import (
    build_agg_state,
    merge_agg_state,
    refresh_agg_parquet,
)

MEASURES = {
    "n": ("v", "count"),
    "s": ("v", "sum"),
    "mx": ("v", "max"),
    "mn": ("v", "min"),
}


def _rows(spark, rows):
    return spark.createDataFrame(rows, "k string, v double")


def _state_map(df):
    return {
        r["k"]: (r["n"], float(r["s"]), r["mx"], r["mn"])
        for r in df.collect()
    }


def test_merge_equals_full_recompute(spark):
    base_rows = [("a", 1.25), ("a", 2.50), ("b", 10.00), ("c", -3.75)]
    batch_rows = [("a", 4.00), ("b", -1.00), ("d", 7.25)]
    base = build_agg_state(_rows(spark, base_rows), ["k"], MEASURES)
    batch = build_agg_state(_rows(spark, batch_rows), ["k"], MEASURES)
    merged = merge_agg_state(base, batch, ["k"], MEASURES)
    full = build_agg_state(
        _rows(spark, base_rows + batch_rows), ["k"], MEASURES
    )
    assert _state_map(merged) == _state_map(full)


def test_merge_is_associative_across_batches(spark):
    """(base ⊕ b1) ⊕ b2 == base ⊕ (b1 ∪ b2) — the property that lets
    nightly batches apply in any grouping."""
    base_rows = [("a", 1.0), ("b", 2.0)]
    b1 = [("a", 3.0), ("c", 4.0)]
    b2 = [("b", 5.0), ("c", 6.0)]
    s = lambda rows: build_agg_state(_rows(spark, rows), ["k"], MEASURES)  # noqa: E731
    left = merge_agg_state(
        merge_agg_state(s(base_rows), s(b1), ["k"], MEASURES),
        s(b2),
        ["k"],
        MEASURES,
    )
    right = merge_agg_state(s(base_rows), s(b1 + b2), ["k"], MEASURES)
    assert _state_map(left) == _state_map(right)


def test_refresh_parquet_updates_and_inserts(spark, tmp_path):
    state0 = str(tmp_path / "v0")
    state1 = str(tmp_path / "v1")
    base_rows = [("a", 1.0), ("a", 2.0), ("b", 3.0)]
    build_agg_state(_rows(spark, base_rows), ["k"], MEASURES).write.parquet(
        state0
    )
    batch_rows = [("a", 10.0), ("z", 5.0)]  # update 'a', insert 'z'
    stats = refresh_agg_parquet(
        spark, state0, _rows(spark, batch_rows), ["k"], MEASURES, state1
    )
    assert stats["rows_updated"] == 1 and stats["rows_inserted"] == 1
    got = _state_map(spark.read.parquet(state1))
    full = _state_map(
        build_agg_state(_rows(spark, base_rows + batch_rows), ["k"], MEASURES)
    )
    assert got == full
    # untouched key 'b' must carry over bit-exact
    assert got["b"] == (1, 3.0, 3.0, 3.0)


def test_refresh_never_reads_raw_corpus(spark, tmp_path):
    """Cost contract: the refresh plan reads the STATE dataset and the
    batch only. Feed a batch whose keys miss every state file — the
    merge must rewrite nothing and copy everything."""
    state0 = str(tmp_path / "v0")
    state1 = str(tmp_path / "v1")
    build_agg_state(
        _rows(spark, [("a", 1.0), ("b", 2.0)]), ["k"], MEASURES
    ).write.parquet(state0)
    stats = refresh_agg_parquet(
        spark, state0, _rows(spark, [("zz", 9.0)]), ["k"], MEASURES, state1
    )
    assert stats["files_rewritten"] == 0
    assert stats["rows_inserted"] == 1


def test_sum_state_is_exact_decimal(spark):
    """0.1-style doubles must merge exactly: state sums go through
    decimal, so repeated merges can't accumulate float drift."""
    rows = [("a", 0.10)] * 10
    st = build_agg_state(_rows(spark, rows), ["k"], MEASURES)
    [r] = st.collect()
    assert float(r["s"]) == 1.00
    field = dict(zip(st.columns, st.schema.fields))["s"]
    assert "decimal" in field.dataType.simpleString()


def test_unmergeable_measure_raises(spark):
    with pytest.raises(ValueError, match="not mergeable"):
        build_agg_state(
            _rows(spark, [("a", 1.0)]), ["k"], {"bad": ("v", "avg")}
        )


def test_diff_tables_classifies_all_ops(spark):
    from cae_polars_tools_spark.storage import diff_tables

    old = spark.createDataFrame(
        [("a", 1, "x"), ("b", 2, "y"), ("c", 3, None)],
        "k string, n long, s string",
    )
    new = spark.createDataFrame(
        [("a", 1, "x"), ("b", 9, "y"), ("d", 4, "z"), ("c", 3, "now")],
        "k string, n long, s string",
    )
    got = {
        (r["op"], r["k"], r["n"], r["s"])
        for r in diff_tables(old, new, ["k"]).collect()
    }
    assert got == {
        ("update", "b", 9, "y"),      # value change
        ("update", "c", 3, "now"),    # NULL -> value must register
        ("insert", "d", 4, "z"),      # new key carries new values
    }

    # deletes carry the OLD row's values
    got2 = {
        (r["op"], r["k"], r["n"])
        for r in diff_tables(new, old, ["k"]).collect()
    }
    assert ("delete", "d", 4) in got2

    # value→NULL edits must surface the NEW (NULL) value — a
    # per-column coalesce would resurrect the old value and lose the
    # NULL-ing edit
    got3 = {
        (r["op"], r["k"], r["s"])
        for r in diff_tables(new, old, ["k"]).collect()
        if r["k"] == "c"
    }
    assert got3 == {("update", "c", None)}


def test_diff_tables_identical_versions_empty(spark):
    from cae_polars_tools_spark.storage import diff_tables

    df = spark.createDataFrame([("a", 1), ("b", None)], "k string, n long")
    assert diff_tables(df, df, ["k"]).count() == 0


def test_diff_tables_schema_drift_raises(spark):
    import pytest

    from cae_polars_tools_spark.storage import diff_tables

    old = spark.createDataFrame([("a", 1)], "k string, n long")
    new = spark.createDataFrame([("a", 1)], "k string, m long")
    with pytest.raises(ValueError, match="column sets differ"):
        diff_tables(old, new, ["k"])


def test_refresh_overflow_raises_not_nulls(spark, tmp_path):
    """The merged sum is decimal-widened by re-aggregation; casting it
    back down to a too-narrow persisted dtype must raise loudly, not
    persist a silently-NULLed sum (non-ANSI cast behavior)."""
    from decimal import Decimal

    state0 = str(tmp_path / "v0")
    state1 = str(tmp_path / "v1")
    # a state table persisted with a narrow sum dtype — decimal(6,2)
    # tops out at 9999.99, so merging in 5000 must overflow
    spark.createDataFrame(
        [("a", 1, Decimal("9000.00"), 9000.0, 9000.0)],
        "k string, n bigint, s decimal(6,2), mx double, mn double",
    ).write.parquet(state0)
    with pytest.raises(ValueError, match="overflows the persisted dtype"):
        refresh_agg_parquet(
            spark, state0, _rows(spark, [("a", 5000.0)]), ["k"],
            MEASURES, state1,
        )
    # a fitting batch against the same narrow state still succeeds
    stats = refresh_agg_parquet(
        spark, state0, _rows(spark, [("a", 50.0)]), ["k"], MEASURES, state1
    )
    assert stats["rows_updated"] == 1
    got = _state_map(spark.read.parquet(state1))
    assert got["a"] == (2, 9050.0, 9000.0, 50.0)


def test_refresh_agg_table_zero_copy_manifest(spark, tmp_path):
    """The Table-backed refresher: only state files containing an
    affected key rewrite; every other state file is re-referenced by
    the new version's manifest (zero copies, inodes untouched), and
    the refreshed state equals a from-scratch rebuild."""
    import os

    from pyspark.sql import functions as F

    from cae_polars_tools_spark.operators.incremental import (
        build_agg_state,
        refresh_agg_table,
    )
    from cae_polars_tools_spark.table import Table

    measures = {
        "n": ("k", "count"),
        "s": ("v", "sum"),
        "mx": ("v", "max"),
    }
    rows = [(i % 40, float(i)) for i in range(400)]
    df = spark.createDataFrame(rows, "k long, v double")
    seed = df.filter("v < 300")
    # narrow the batch to a few keys so most state files stay untouched
    batch = df.filter("v >= 300 AND k < 4")

    root = str(tmp_path / "state")
    t = Table.create(
        spark,
        root,
        build_agg_state(seed, ["k"], measures)
        .repartitionByRange(8, "k")
        .sortWithinPartitions("k"),
    )
    v0_inodes = {
        os.path.join(r, f): os.stat(os.path.join(r, f)).st_ino
        for r, _d, fs in os.walk(f"{root}/v0")
        for f in fs
        if f.endswith(".parquet")
    }
    stats = refresh_agg_table(t, batch, ["k"], measures)
    assert stats["files_rewritten"] >= 1
    assert stats["files_referenced"] >= 1
    for f, ino in v0_inodes.items():
        assert os.stat(f).st_ino == ino
    # correctness: refreshed state == rebuild over seed ∪ (batch k<4)
    want = {
        tuple(r)
        for r in build_agg_state(
            seed.unionByName(batch), ["k"], measures
        ).collect()
    }
    got = {tuple(r) for r in t.current().collect()}
    assert got == want
    assert [h["op"] for h in t.describe_history()] == [
        "create",
        "agg-refresh",
    ]

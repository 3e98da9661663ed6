"""plan_report / assert_scale_safe: the plan audit as a library."""

from __future__ import annotations

import pytest

from cae_polars_tools_spark.diagnostics import assert_scale_safe, plan_report
from cae_polars_tools_spark.plans.registry import load_all

SF = "/root/testdata/sf0.001"


def _build(spark, name):
    return load_all()[name].build(spark, SF)


def test_report_on_agg_query(spark):
    df = _build(spark, "q01_pricing_summary")
    rep = plan_report(df)
    assert rep["n_exchanges"] >= 1
    assert rep["joins"]["sort_merge"] == 0
    assert not rep["has_cartesian"]
    # AQE finalizes the plan at execution: codegen unknown before,
    # counted after
    assert rep["codegen_stage_count"] is None
    df.collect()
    assert plan_report(df)["codegen_stage_count"] >= 1
    assert rep["python_stages"] == []
    assert any(s["format"] == "parquet" for s in rep["scans"])
    assert any(
        s["pushed_filters"] not in (None, "[]") for s in rep["scans"]
    )


def test_report_sees_broadcast_joins_and_python_stages(spark):
    rep = plan_report(_build(spark, "q11_join_regional_revenue"))
    assert rep["joins"]["broadcast_hash"] >= 1
    rep2 = plan_report(_build(spark, "bpe_token_counts"))
    assert "MapInPandas" in rep2["python_stages"]
    assert rep2["n_exchanges"] <= 1  # spread round-robin at tiny sf only


def test_single_partition_exchange_is_counted(spark):
    # a global (no-group-by) aggregate plans an `Exchange SinglePartition`
    # node — no parenthesized detail — which the audit MUST count: it is
    # the costliest shuffle shape the gate exists to catch
    df = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .agg({"l_quantity": "sum"})
    )
    rep = plan_report(df)
    kinds = [e["partitioning"] for e in rep["exchanges"]]
    assert "SinglePartition" in kinds
    assert rep["n_exchanges"] >= 1
    with pytest.raises(AssertionError, match="exchanges > allowed"):
        assert_scale_safe(df, max_exchanges=0)


def test_broadcast_exchanges_reported_separately(spark):
    rep = plan_report(_build(spark, "q11_join_regional_revenue"))
    assert rep["n_broadcast_exchanges"] >= 1
    # broadcast replication is not a shuffle of the big side: none of the
    # counted exchanges should be the broadcast mode
    assert all(
        "BroadcastMode" not in e["partitioning"] for e in rep["exchanges"]
    )


def test_after_execution_reports_final_aqe_plan(spark):
    # an AQE-replanned join: pre-execution codegen is unknown, the
    # after_execution report describes the finalized plan without
    # collecting rows to the driver
    df = _build(spark, "q11_join_regional_revenue")
    assert plan_report(df)["codegen_stage_count"] is None
    rep = plan_report(df, after_execution=True)
    assert rep["codegen_stage_count"] >= 1
    assert rep["joins"]["broadcast_hash"] >= 1
    # idempotent on an executed frame
    rep2 = plan_report(df, after_execution=True)
    assert rep2["codegen_stage_count"] == rep["codegen_stage_count"]


def test_assert_scale_safe_passes_and_fails(spark):
    df = _build(spark, "q01_pricing_summary")
    rep = assert_scale_safe(
        df, max_exchanges=3, require_pushed_filters=True
    )
    assert rep["n_exchanges"] <= 3
    with pytest.raises(AssertionError, match="exchanges > allowed"):
        assert_scale_safe(df, max_exchanges=0)
    cross = _build(spark, "q35_cross_join")
    # the deliberate cross join is broadcast-nested-loop, not cartesian
    assert_scale_safe(cross)
    with pytest.raises(AssertionError, match="python stages"):
        assert_scale_safe(
            _build(spark, "bpe_token_counts"), forbid_python=True
        )

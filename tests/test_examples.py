"""The examples stay runnable: drive the example functions against the
session fixture (mirrors the reference's runnable examples/ directory,
reference examples/basic_usage.py)."""

from __future__ import annotations

import importlib
import os
import sys


def _mod():
    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    )
    return importlib.import_module("examples.basic_usage")


def test_pipeline_example_runs(spark, capsys, monkeypatch):
    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    )
    ex = importlib.import_module("examples.pipeline_usage")
    monkeypatch.setattr(sys, "argv", ["pipeline_usage.py"])
    ex.main()
    out = capsys.readouterr().out
    assert "Pipeline complete." in out
    assert "packed" in out


def test_examples_run_end_to_end(spark, tmp_path, capsys):
    ex = _mod()
    store = ex.make_demo_store(str(tmp_path / "demo.zarr"))
    ex.basic_example(spark, store)
    ex.advanced_analysis_example(spark, store)
    ex.dataset_info_example(store)
    ex.memory_efficient_example(spark, store)
    ex.datasource_and_sink_example(spark, store, str(tmp_path / "sink.zarr"))
    out = capsys.readouterr().out
    assert "Seasonal summary" in out
    assert "Sink wrote" in out


def test_multimodal_example_runs(spark, capsys, monkeypatch):
    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    )
    ex = importlib.import_module("examples.multimodal_usage")
    monkeypatch.setattr(sys, "argv", ["multimodal_usage.py"])
    ex.main()
    out = capsys.readouterr().out
    assert "Multimodal demo complete." in out
    assert "image features" in out
    assert "multi-probe LSH" in out


def test_ann_example_runs(spark, capsys, monkeypatch):
    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    )
    ex = importlib.import_module("examples.ann_usage")
    monkeypatch.setattr(sys, "argv", ["ann_usage.py"])
    ex.main()
    out = capsys.readouterr().out
    assert "ANN demo complete." in out
    assert "IVF-PQ + exact re-rank" in out
    assert "PCA: projected" in out


def test_lakehouse_example_runs(spark, capsys, monkeypatch):
    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    )
    ex = importlib.import_module("examples.lakehouse_usage")
    monkeypatch.setattr(sys, "argv", ["lakehouse_usage.py"])
    ex.main()
    out = capsys.readouterr().out
    assert "Lakehouse demo complete." in out
    assert "CDC upsert" in out
    assert "takedown" in out and "copy-on-write" in out
    assert "transitive closure" in out

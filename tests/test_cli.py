"""CLI contracts (reference test_cli.py: parser + per-command paths)."""

from __future__ import annotations

import json

import numpy as np
import pytest

from cae_polars_tools_spark.cli import (
    main,
    parse_select_dims,
    parse_storage_options,
)
from cae_polars_tools_spark.sources.zarr_format import write_group


# -- option parsing (reference test_cli.py:55-113) --------------------------


def test_storage_options_json():
    assert parse_storage_options('{"anon": true, "key": "k"}') == {
        "anon": True,
        "key": "k",
    }


def test_storage_options_kv():
    assert parse_storage_options("anon=true,key=abc") == {"anon": True, "key": "abc"}


def test_storage_options_invalid():
    with pytest.raises(ValueError):
        parse_storage_options("not valid at all")


def test_storage_options_empty():
    assert parse_storage_options(None) is None
    assert parse_storage_options("") is None


def test_select_dims_literal_dict():
    assert parse_select_dims("{'time': 5, 'lat': [1, 2]}") == {
        "time": 5,
        "lat": [1, 2],
    }


def test_select_dims_kv_with_slices():
    out = parse_select_dims("time=0:12,lat=3,lon=[0,2,4],lev=::2")
    assert out == {
        "time": slice(0, 12, None),
        "lat": 3,
        "lon": [0, 2, 4],
        "lev": slice(None, None, 2),
    }


def test_select_dims_invalid():
    with pytest.raises(ValueError):
        parse_select_dims("time 0:12")


# -- commands ----------------------------------------------------------------


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cli") / "s.zarr")
    write_group(
        root,
        arrays={"a": np.arange(12, dtype=np.float32).reshape(3, 4)},
        dims={"a": ("x", "y")},
        coords={"x": np.array([10, 20, 30], dtype=np.int64)},
    )
    return root


def test_info_command(store, capsys):
    assert main(["info", store]) == 0
    doc = json.loads(capsys.readouterr().out)
    assert doc["store_path"] == store
    assert doc["arrays"]["a"]["shape"] == [3, 4] or doc["arrays"]["a"]["shape"] == (3, 4)


def test_info_command_tristate_consolidated(store, capsys):
    """--no-consolidated skips .zmetadata (tri-state, like the
    reference's consolidated=None/True/False); both forms still read
    the same per-file metadata here."""
    assert main(["info", store, "--no-consolidated"]) == 0
    doc = json.loads(capsys.readouterr().out)
    assert "a" in doc["arrays"]
    assert main(["info", store, "--consolidated"]) == 0
    assert "a" in json.loads(capsys.readouterr().out)["arrays"]


def test_info_command_output_file(store, tmp_path, capsys):
    out = str(tmp_path / "info.json")
    assert main(["info", store, "-o", out]) == 0
    assert json.loads(open(out).read())["arrays"]["a"]["dtype"] == "float32"


def test_read_command(store, tmp_path, spark, capsys):
    out = str(tmp_path / "a.parquet")
    assert main(["read", store, "a", "--select-dims", "x=0:2", "-o", out]) == 0
    msg = capsys.readouterr().out
    assert "8 rows" in msg
    assert spark.read.parquet(out).count() == 8


def test_write_command_roundtrips_read(store, tmp_path, spark, capsys):
    """read → parquet → write → a new zarr store with identical values:
    the CLI is bidirectional (the reference's is read-only)."""
    from cae_polars_tools_spark.sources.zarr_scan import scan_data

    pq = str(tmp_path / "a.parquet")
    assert main(["read", store, "a", "-o", pq]) == 0
    capsys.readouterr()
    sink = str(tmp_path / "sink.zarr")
    assert main(["write", sink, pq, "--chunks", "2,2"]) == 0
    msg = capsys.readouterr().out
    assert "chunks" in msg and sink in msg
    orig = {
        tuple(r[d] for d in r.asDict() if d != "value"): r["value"]
        for r in scan_data(spark, store, "a").collect()
    }
    back_df = scan_data(spark, sink, "value")
    back = {
        tuple(r[d] for d in r.asDict() if d != "value"): r["value"]
        for r in back_df.collect()
    }
    assert back == orig


def test_benchmark_command(store, spark, capsys):
    assert main(["benchmark", store, "--array-name", "a"]) == 0
    out = capsys.readouterr().out
    assert "Read (DataFrame creation):" in out
    assert "Collect (materialization):" in out
    assert "Total:" in out


def test_error_exit_code(capsys):
    assert main(["info", "/no/such/store.zarr"]) == 1
    assert "Error:" in capsys.readouterr().err


def test_write_command_sharded_v3(store, tmp_path, spark, capsys):
    """CLI write --shard-chunks emits a v3 sharded store that info
    reports with both inner-chunk and shard geometry."""
    import json as _json

    pq = str(tmp_path / "a3.parquet")
    assert main(["read", store, "a", "-o", pq]) == 0
    sink = str(tmp_path / "sink3.zarr")
    assert (
        main(["write", sink, pq, "--chunks", "2,2", "--shard-chunks", "4,4"])
        == 0
    )
    capsys.readouterr()
    out = str(tmp_path / "info.json")
    assert main(["info", sink, "-o", out]) == 0
    info = _json.load(open(out))
    arr = info["arrays"]["value"]
    assert tuple(arr["chunks"]) == (2, 2)
    assert tuple(arr["shard_chunks"]) == (4, 4)


def test_storage_options_kv_numeric_coercion():
    from cae_polars_tools_spark.cli import parse_storage_options

    out = parse_storage_options(
        "anon=true,default_block_size=1048576,timeout=2.5,name=abc"
    )
    assert out == {
        "anon": True,
        "default_block_size": 1048576,
        "timeout": 2.5,
        "name": "abc",
    }


def test_select_dims_dict_specs_normalize_to_slices():
    from cae_polars_tools_spark.cli import parse_select_dims

    # literal-dict form with a nested {"start","stop"} spec
    out = parse_select_dims("{'time': {'start': 0, 'stop': 3}, 'lat': 2}")
    assert out == {"time": slice(0, 3, None), "lat": 2}
    # k=v form with braces: the splitter must not break at the
    # comma inside the dict
    out = parse_select_dims("lon={'start': 0, 'stop': 3},time=1")
    assert out == {"lon": slice(0, 3, None), "time": 1}


def test_append_command_grows_the_store(spark, tmp_path, capsys):
    """CLI append: write a store, append one more time step from
    parquet, and verify the grown shape through a fresh scan."""
    from cae_polars_tools_spark.cli import main
    from cae_polars_tools_spark.sources.zarr_scan import scan_data
    from cae_polars_tools_spark.sources.zarr_write import write_zarr

    root = str(tmp_path / "cli_append.zarr")
    base = spark.createDataFrame(
        [(t, j, float(t + j)) for t in (1, 2) for j in range(3)],
        "time int, x int, value double",
    )
    write_zarr(base, root, chunks=(2, 2))
    pq = str(tmp_path / "more.parquet")
    spark.createDataFrame(
        [(3, j, float(3 + j)) for j in range(3)],
        "time int, x int, value double",
    ).write.parquet(pq)

    assert main(["append", root, pq, "time"]) == 0
    out = capsys.readouterr().out
    assert "Appended 1 time step(s)" in out
    got = {
        (r["time"], r["x"]): r["value"]
        for r in scan_data(spark, root, "value").collect()
    }
    assert len(got) == 9 and got[(3, 2)] == 5.0


def test_select_ranges_parser():
    from cae_polars_tools_spark.cli import parse_select_ranges

    out = parse_select_ranges("lat=30:60,time=2020-01-01:2020-06-30,lev=850")
    assert out == {
        "lat": slice(30, 60),
        "time": slice("2020-01-01", "2020-06-30"),
        "lev": 850,
    }
    assert parse_select_ranges("x=:12,y=5:") == {
        "x": slice(None, 12),
        "y": slice(5, None),
    }
    assert parse_select_ranges("{'lat': {'start': 30, 'stop': 60}, 'lev': [850, 500]}") == {
        "lat": slice(30, 60),
        "lev": [850, 500],
    }
    assert parse_select_ranges(None) is None
    with pytest.raises(ValueError, match="literal-dict form"):
        parse_select_ranges("t=00:10:30")


def test_read_command_select_ranges(store, tmp_path, spark, capsys):
    """--select-ranges selects by coordinate VALUE: x coords are
    10/20/30, so 15:30 keeps the last two rows of the 3x4 grid."""
    out = str(tmp_path / "vr.parquet")
    assert main(["read", store, "a", "--select-ranges", "x=15:30", "-o", out]) == 0
    assert "8 rows" in capsys.readouterr().out
    got = spark.read.parquet(out)
    assert sorted(r["x"] for r in got.select("x").distinct().collect()) == [20, 30]


def test_cli_list_queries(capsys):
    from cae_polars_tools_spark.cli import main

    assert main(["list-queries"]) == 0
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if ln]
    assert len(lines) >= 100
    names = {ln.split("\t")[0] for ln in lines}
    assert {"q01_pricing_summary", "dedup_exact", "mm_gif_features"} <= names
    # oracle status column present
    assert any("\toracle\t" in ln for ln in lines)


def test_cli_query_runs_and_writes_parquet(spark, capsys, tmp_path):
    from cae_polars_tools_spark.cli import main

    out = str(tmp_path / "q05.parquet")
    assert main([
        "query", "q05_global_agg",
        "--sf-dir", "/root/testdata/sf0.001", "-o", out,
    ]) == 0
    assert "Wrote" in capsys.readouterr().out
    assert spark.read.parquet(out).count() >= 1


def test_cli_query_show_and_unknown_name(capsys):
    from cae_polars_tools_spark.cli import main

    assert main([
        "query", "q05_global_agg",
        "--sf-dir", "/root/testdata/sf0.001", "--show", "3",
    ]) == 0
    assert "+" in capsys.readouterr().out  # show() table border
    with pytest.raises(SystemExit, match="did you mean"):
        main(["query", "q05_global_ag"])


def test_cli_explain_prints_physical_plan(capsys):
    from cae_polars_tools_spark.cli import main

    assert main(["explain", "q03_filter_predicates"]) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out
    assert "PushedFilters" in out  # the predicates reached the scan
    # unknown entries fail with a suggestion (same SystemExit shape
    # as the query subcommand)
    import pytest as _pytest

    with _pytest.raises(SystemExit, match="did you mean"):
        main(["explain", "q03_filter_predicate"])


def test_docs_matrix_matches_committed_readme():
    """The README operator-matrix section must be EXACTLY what the
    registry generates — docs derived from code cannot drift from the
    entry list the way hand-maintained prose can. Regenerate with
    `python -m cae_polars_tools_spark.cli docs --write README.md`."""
    import os

    from cae_polars_tools_spark.cli import (
        _MATRIX_BEGIN,
        _MATRIX_END,
        generate_operator_matrix,
    )

    readme = os.path.join(
        os.path.dirname(__file__), "..", "README.md"
    )
    with open(readme) as fh:
        doc = fh.read()
    assert _MATRIX_BEGIN in doc and _MATRIX_END in doc
    committed = doc.split(_MATRIX_BEGIN, 1)[1].split(_MATRIX_END, 1)[0]
    assert committed.strip("\n") == generate_operator_matrix(), (
        "README operator matrix is stale — regenerate with "
        "`python -m cae_polars_tools_spark.cli docs --write README.md`"
    )


def test_docs_command_print_and_write(tmp_path, capsys):
    from cae_polars_tools_spark.cli import main

    assert main(["docs"]) == 0
    out = capsys.readouterr().out
    assert "| entry | oracle |" in out and "`q01_pricing_summary`" in out
    # --write refuses a file without the marker pair
    p = tmp_path / "no_markers.md"
    p.write_text("# nothing here\n")
    import pytest

    with pytest.raises(SystemExit, match="marker pair"):
        main(["docs", "--write", str(p)])


def test_takedown_command(spark, tmp_path, capsys):
    """CLI cascade: one invocation purges the Table and a MinHash
    index, prints the manifest; a bad index path exits 1 with the
    partial manifest on stdout."""
    from cae_polars_tools_spark.operators.minhash_index import (
        build_minhash_index,
    )
    from cae_polars_tools_spark.table import Table

    docs = spark.createDataFrame(
        [(i, f"document body {i} words " * 5, "s") for i in range(20)],
        "doc_id long, text string, source string",
    )
    troot = str(tmp_path / "t")
    mroot = str(tmp_path / "m")
    Table.create(spark, troot, docs)
    build_minhash_index(docs, mroot)

    assert (
        main(
            [
                "takedown",
                "--ids", "3,7",
                "--table", troot,
                "--minhash-index", mroot,
            ]
        )
        == 0
    )
    manifest = json.loads(capsys.readouterr().out)
    assert manifest["doc_ids"] == [3, 7]
    assert manifest["table"]["rows_deleted"] == 2
    assert manifest["minhash"][0]["sigs"]["rows_deleted"] == 2
    assert Table(spark, troot).current().filter("doc_id IN (3,7)").count() == 0

    # partial failure: bad index path → exit 1, partial manifest shown
    rc = main(
        [
            "takedown",
            "--ids", "5",
            "--table", troot,
            "--minhash-index", str(tmp_path / "missing"),
        ]
    )
    assert rc == 1
    out = capsys.readouterr()
    partial = json.loads(out.out)
    assert partial["table"]["rows_deleted"] == 1
    assert "Error:" in out.err


def test_cli_takedown_string_ids(spark, tmp_path, capsys):
    """A Table keyed by STRING doc ids purges through the CLI: ids
    that don't all parse as ints pass through as strings (previously
    int() raised before the cascade ever ran)."""
    from cae_polars_tools_spark.table import Table

    docs = spark.createDataFrame(
        [(f"doc-{i}", f"document body {i} words " * 5) for i in range(10)],
        "doc_id string, text string",
    )
    troot = str(tmp_path / "t")
    Table.create(spark, troot, docs)
    assert (
        main(["takedown", "--ids", "doc-3,doc-7", "--table", troot])
        == 0
    )
    manifest = json.loads(capsys.readouterr().out)
    assert manifest["doc_ids"] == ["doc-3", "doc-7"]
    assert manifest["table"]["rows_deleted"] == 2
    assert (
        Table(spark, troot)
        .current()
        .filter("doc_id IN ('doc-3','doc-7')")
        .count()
        == 0
    )


def test_cli_history_table_and_index(spark, tmp_path, capsys):
    """`history` prints the audit trail of any versioned artifact —
    Table commit sidecars (without starting a Spark session) or an
    index's meta history — and refuses a non-artifact path."""
    from cae_polars_tools_spark.operators.minhash_index import (
        build_minhash_index,
        delete_minhash_index,
    )
    from cae_polars_tools_spark.table import Table

    docs = spark.createDataFrame(
        [(i, f"document body {i} words " * 5, "s") for i in range(10)],
        "doc_id long, text string, source string",
    )
    troot = str(tmp_path / "t")
    t = Table.create(spark, troot, docs)
    t.delete("doc_id = 3")
    assert main(["history", troot]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["kind"] == "table"
    assert [r["op"] for r in out["history"]] == ["create", "delete"]

    mroot = str(tmp_path / "m")
    build_minhash_index(docs, mroot)
    delete_minhash_index(spark, mroot, "doc_id = 3")
    assert main(["history", mroot]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["kind"] == "minhash-index"
    assert [r["op"] for r in out["history"]] == ["build", "delete"]

    assert main(["history", str(tmp_path / "nope")]) == 1
    assert "no versioned artifact" in capsys.readouterr().err


def test_cli_takedown_id_type_flag(spark, tmp_path, capsys):
    """--id-type makes id typing explicit: 'string' keeps
    numeric-looking keys ('007') as strings, 'int' refuses a
    non-parsing id loudly instead of silently degrading the whole
    list, and the cascade's takedown_id lands in the manifest AND the
    artifact's history (--takedown-id pins it for retries)."""
    from cae_polars_tools_spark.table import Table

    docs = spark.createDataFrame(
        [(f"{i:03d}", f"document body {i} words " * 5) for i in range(10)],
        "doc_id string, text string",
    )
    troot = str(tmp_path / "t")
    Table.create(spark, troot, docs)

    # 'auto' would coerce "007" to int 7 and match nothing on a
    # string key column — --id-type string purges it
    assert (
        main(
            [
                "takedown", "--ids", "007",
                "--table", troot,
                "--id-type", "string",
                "--takedown-id", "req-42",
            ]
        )
        == 0
    )
    manifest = json.loads(capsys.readouterr().out)
    assert manifest["doc_ids"] == ["007"]
    assert manifest["takedown_id"] == "req-42"
    assert manifest["table"]["rows_deleted"] == 1
    hist = Table(spark, troot).describe_history()
    assert hist[-1]["stats"]["takedown_id"] == "req-42"

    # strict int typing refuses a mixed list loudly
    rc = main(
        [
            "takedown", "--ids", "7,abc",
            "--table", troot,
            "--id-type", "int",
        ]
    )
    assert rc == 1
    assert "does not parse" in capsys.readouterr().err


def test_cli_maintain_reports_and_compacts(spark, tmp_path, capsys):
    """`maintain` prints the Table's layout health; --compact resets
    branch sprawl through the normal pointer discipline."""
    from pyspark.sql import functions as F

    from cae_polars_tools_spark.table import Table

    root = str(tmp_path / "t")
    seed = (
        spark.range(300)
        .select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
        .repartitionByRange(6, "k")
        .sortWithinPartitions("k")
    )
    t = Table.create(spark, root, seed)
    for i in range(3):
        t.merge(
            seed.filter(
                (F.col("k") >= 100 * i) & (F.col("k") < 100 * i + 2)
            ).withColumn("v", F.lit(-1.0)),
            keys=["k"],
        )
    assert main(["maintain", root, "--max-branches", "2"]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["branches"] > 2 and not rep["compacted"]
    assert "compact" in rep["recommendation"]

    assert (
        main(["maintain", root, "--max-branches", "2", "--compact"]) == 0
    )
    rep2 = json.loads(capsys.readouterr().out)
    assert rep2["compacted"]
    assert Table(spark, root).maintain(max_branches=2)["branches"] == 1

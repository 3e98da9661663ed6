"""Command-line interface: ``info`` / ``read`` / ``benchmark``.

Mirrors the reference CLI's shape (reference cli.py:347-453 —
argparse subcommands, storage-options parsing as JSON or k=v pairs,
errors to stderr with exit 1) with two deliberate improvements:

* ``--select-dims`` supports slices from the CLI via ``dim=start:stop``
  / ``dim=start:stop:step`` syntax (the reference's literal-eval parser
  could not express slices, reference cli.py:334-337);
* ``benchmark`` reports the reference's metric set (read seconds =
  DataFrame creation, collect seconds = materialization, total, rows,
  estimated MB; reference cli.py:234-250).

Usage::

    python -m cae_polars_tools_spark.cli info  /path/store.zarr
    python -m cae_polars_tools_spark.cli read  /path/store.zarr temperature \
        --select-dims 'time=0:12,lat=3' -o out.parquet
    python -m cae_polars_tools_spark.cli benchmark /path/store.zarr
"""

from __future__ import annotations

import argparse
import ast
import json
import os
import sys
import time
from typing import Any


# ---------------------------------------------------------------------------
# Option parsers (reference cli.py:257-344)
# ---------------------------------------------------------------------------


def parse_storage_options(text: str | None) -> dict | None:
    """JSON dict, or comma-separated ``k=v`` pairs (reference
    cli.py:257-300). Values 'true'/'false' become booleans."""
    if not text:
        return None
    try:
        out = json.loads(text)
        if not isinstance(out, dict):
            raise ValueError("storage options JSON must be an object")
        return out
    except json.JSONDecodeError:
        pass
    out: dict[str, Any] = {}
    for pair in text.split(","):
        if "=" not in pair:
            raise ValueError(
                f"invalid storage option {pair!r}: expected JSON or k=v pairs"
            )
        k, v = pair.split("=", 1)
        v = v.strip()
        if v.lower() in ("true", "false"):
            out[k.strip()] = v.lower() == "true"
        else:
            # numbers become numbers: fsspec options like
            # default_block_size expect ints and fail (or silently
            # misbehave) on strings
            try:
                out[k.strip()] = int(v)
            except ValueError:
                try:
                    out[k.strip()] = float(v)
                except ValueError:
                    out[k.strip()] = v
    return out


def parse_select_dims(text: str | None) -> dict | None:
    """Selection parser: JSON/python-literal dict, or comma-separated
    ``dim=spec`` entries where spec is an int, ``[i,j,k]``, or a slice
    ``start:stop[:step]`` (empty endpoints allowed, e.g. ``time=:12``)."""
    if not text:
        return None
    # whole-string literal dict (reference used ast.literal_eval);
    # nested {"start","stop","step"} specs normalize to real slices —
    # the same conversion the data source path applies (plan_scan
    # itself accepts only int/slice/list)
    from cae_polars_tools_spark.sources.zarr_datasource import (
        decode_select_dims,
    )

    try:
        val = ast.literal_eval(text)
        if isinstance(val, dict):
            return decode_select_dims(val)
    except (ValueError, SyntaxError):
        pass
    out: dict[str, Any] = {}
    depth = 0
    entries: list[str] = []
    cur = ""
    for ch in text:
        if ch == "," and depth == 0:
            entries.append(cur)
            cur = ""
            continue
        if ch in "[({":
            depth += 1
        elif ch in "])}":
            depth -= 1
        cur += ch
    if cur:
        entries.append(cur)
    for entry in entries:
        if "=" not in entry:
            raise ValueError(f"invalid select-dims entry {entry!r}")
        dim, spec = entry.split("=", 1)
        dim, spec = dim.strip(), spec.strip()
        # dict specs carry ':' inside braces — they are literals, not
        # start:stop slices
        if ":" in spec and not spec.startswith("{"):
            parts = spec.split(":")
            if len(parts) > 3:
                raise ValueError(f"invalid slice {spec!r}")
            nums = [int(p) if p else None for p in parts]
            nums += [None] * (3 - len(nums))
            out[dim] = slice(*nums)
        else:
            v = ast.literal_eval(spec)
            out[dim] = (
                slice(v.get("start"), v.get("stop"), v.get("step"))
                if isinstance(v, dict)
                else v
            )
    return out


def _parse_label(text: str) -> Any:
    """CLI label endpoint: python literal when it parses (numbers,
    quoted strings), else the raw string (date strings like
    2020-01-01 need no quoting)."""
    try:
        return ast.literal_eval(text)
    except (ValueError, SyntaxError):
        return text


def parse_select_ranges(text: str | None) -> dict | None:
    """VALUE-selection parser for ``--select-ranges``: JSON/python-
    literal dict, or comma-separated ``dim=spec`` entries where spec is
    a scalar label, ``[v1,v2]``, or a value range ``start:stop``
    (inclusive both ends, empty endpoints allowed — ``lat=30:60``,
    ``time=:2020-06-30``). Labels containing ':' (timestamps) need the
    literal-dict form."""
    if not text:
        return None
    try:
        val = ast.literal_eval(text)
        if isinstance(val, dict):
            return {
                k: (
                    slice(v.get("start"), v.get("stop"))
                    if isinstance(v, dict)
                    else v
                )
                for k, v in val.items()
            }
    except (ValueError, SyntaxError):
        pass
    out: dict[str, Any] = {}
    depth = 0
    entries, cur = [], ""
    for ch in text:
        if ch == "," and depth == 0:
            entries.append(cur)
            cur = ""
            continue
        if ch in "[({":
            depth += 1
        elif ch in "])}":
            depth -= 1
        cur += ch
    if cur:
        entries.append(cur)
    for entry in entries:
        if "=" not in entry:
            raise ValueError(f"invalid select-ranges entry {entry!r}")
        dim, spec = entry.split("=", 1)
        dim, spec = dim.strip(), spec.strip()
        if ":" in spec and not spec.startswith(("{", "[")):
            parts = spec.split(":")
            if len(parts) != 2:
                raise ValueError(
                    f"invalid value range {spec!r} (labels containing "
                    "':' need the literal-dict form)"
                )
            lo, hi = (p.strip() for p in parts)
            out[dim] = slice(
                _parse_label(lo) if lo else None,
                _parse_label(hi) if hi else None,
            )
        else:
            out[dim] = _parse_label(spec)
    return out


# ---------------------------------------------------------------------------
# Commands
# ---------------------------------------------------------------------------


def _is_netcdf(path: str) -> bool:
    """Classic-netCDF sniff for a LOCAL file path (zarr stores are
    directories / URLs, so a plain file starting with 'CDF' is
    unambiguous)."""
    p = path[len("file://"):] if path.startswith("file://") else path
    try:
        if not os.path.isfile(p):
            return False
        with open(p, "rb") as fh:
            return fh.read(3) == b"CDF"
    except OSError:
        return False


def info_command(args) -> int:
    """Metadata-only inspection → JSON (reference cli.py:42-96).
    Classic-netCDF files are sniffed and routed to the netCDF
    inspector; everything else is a zarr store."""
    if _is_netcdf(args.store_path):
        from cae_polars_tools_spark.sources.netcdf3 import netcdf3_info

        info = netcdf3_info(args.store_path)
        text = json.dumps(info, indent=2, default=str)
        if args.output:
            with open(args.output, "w") as f:
                f.write(text)
            print(f"Info written to {args.output}")
        else:
            print(text)
        return 0
    from cae_polars_tools_spark.sources.zarr_scan import get_zarr_data_info

    info = get_zarr_data_info(
        args.store_path,
        storage_options=parse_storage_options(args.storage_options),
        group=args.group,
        consolidated=args.consolidated,
    )
    text = json.dumps(info, indent=2, default=str)
    if args.output:
        with open(args.output, "w") as f:
            f.write(text)
        print(f"Info written to {args.output}")
    else:
        print(text)
    return 0


def _session():
    from cae_polars_tools_spark.session import get_spark

    spark = get_spark(app_name="cae-polars-tools-spark-cli")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def read_command(args) -> int:
    """Scan an array and sink to Parquet (reference cli.py:99-169);
    default output ``{array}.parquet``. Classic-netCDF files are
    sniffed and scanned through the netCDF source (same long-format
    contract; value-range selection is zarr-only)."""
    if _is_netcdf(args.store_path):
        from cae_polars_tools_spark.sources.netcdf3 import scan_netcdf3

        if args.select_ranges:
            raise ValueError(
                "--select-ranges is zarr-only; use --select-dims for "
                "netCDF files"
            )
        spark = _session()
        df = scan_netcdf3(
            spark,
            args.store_path,
            args.array_name,
            select_dims=parse_select_dims(args.select_dims),
        )
        output = args.output or f"{args.array_name}.parquet"
        df.write.mode("overwrite").parquet(output)
        n = spark.read.parquet(output).count()
        print(f"Wrote {n} rows x {len(df.columns)} columns to {output}")
        print(f"Columns: {df.columns}")
        return 0
    from cae_polars_tools_spark.sources.zarr_scan import scan_data

    spark = _session()
    df = scan_data(
        spark,
        args.store_path,
        args.array_name,
        storage_options=parse_storage_options(args.storage_options),
        group=args.group,
        select_dims=parse_select_dims(args.select_dims),
        select_ranges=parse_select_ranges(args.select_ranges),
        chunk_size=args.chunk_size,
        streaming=not args.no_streaming,
    )
    output = args.output or f"{args.array_name}.parquet"
    df.write.mode("overwrite").parquet(output)
    n = spark.read.parquet(output).count()
    print(f"Wrote {n} rows x {len(df.columns)} columns to {output}")
    print(f"Columns: {df.columns}")
    return 0


def write_command(args) -> int:
    """Inverse of ``read``: long-format Parquet → chunked zarr store
    via the distributed sink (beyond the reference, whose CLI only
    reads zarr into parquet — reference cli.py:99-169)."""
    from cae_polars_tools_spark.sources.zarr_write import write_zarr

    spark = _session()
    df = spark.read.parquet(args.parquet_path)
    chunks = (
        tuple(int(c) for c in args.chunks.split(",")) if args.chunks else None
    )
    shard_chunks = (
        tuple(int(c) for c in args.shard_chunks.split(","))
        if args.shard_chunks
        else None
    )
    dims = tuple(args.dims.split(",")) if args.dims else None
    summary = write_zarr(
        df,
        args.store_path,
        value_col=args.value_col,
        dims=dims,
        chunks=chunks,
        mode=args.mode,
        storage_options=parse_storage_options(args.storage_options),
        zarr_format=args.zarr_format,
        shard_chunks=shard_chunks,
    )
    print(
        f"Wrote {summary['cells']} cells into {summary['chunks_written']} "
        f"chunks ({summary['bytes']} bytes) at {summary['path']}"
    )
    print(f"Shape: {summary['shape']}  Chunks: {summary['chunks']}")
    return 0


def append_command(args) -> int:
    """Append long-format Parquet along one dimension of an existing
    v2 store (the time-series ingest mode; see
    sources/zarr_write.py::append_zarr for the monotone contract)."""
    from cae_polars_tools_spark.sources.zarr_write import append_zarr

    spark = _session()
    df = spark.read.parquet(args.parquet_path)
    summary = append_zarr(
        df,
        args.store_path,
        append_dim=args.append_dim,
        value_col=args.value_col,
        storage_options=parse_storage_options(args.storage_options),
    )
    print(
        f"Appended {summary['appended']} {args.append_dim} step(s): "
        f"{summary['cells']} cells into {summary['chunks_written']} "
        f"chunks ({summary['bytes']} bytes) at {summary['path']}"
    )
    print(f"New shape: {summary['shape']}")
    return 0


def benchmark_command(args) -> int:
    """Time DataFrame creation vs materialization (reference
    cli.py:172-254). Defaults to the first array when none given."""
    from cae_polars_tools_spark.sources.zarr_scan import scan_data
    from cae_polars_tools_spark.sources.zarr_store import ZarrStore

    spark = _session()
    storage_options = parse_storage_options(args.storage_options)
    store = ZarrStore(args.store_path, storage_options=storage_options, group=args.group)
    arrays = store.list_arrays()
    if not arrays:
        print("No arrays found in store", file=sys.stderr)
        return 1
    name = args.array_name or arrays[0]
    info = store.get_array_info(name)

    t0 = time.perf_counter()
    df = scan_data(
        spark,
        args.store_path,
        name,
        storage_options=storage_options,
        group=args.group,
        streaming=not args.no_streaming,
    )
    read_s = time.perf_counter() - t0

    t1 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    collect_s = time.perf_counter() - t1

    est_mb = info["size_bytes"] / 1e6
    print(f"Array: {name}  shape={info['shape']}  dtype={info['dtype']}")
    print(f"Read (DataFrame creation): {read_s:.4f} s")
    print(f"Collect (materialization): {collect_s:.4f} s")
    print(f"Total: {read_s + collect_s:.4f} s")
    print(f"Estimated data size: {est_mb:.2f} MB")
    return 0


# ---------------------------------------------------------------------------
# Parser / main (reference cli.py:347-453)
# ---------------------------------------------------------------------------


_MATRIX_BEGIN = "<!-- BEGIN GENERATED OPERATOR MATRIX -->"
_MATRIX_END = "<!-- END GENERATED OPERATOR MATRIX -->"


def _plan_pinned_names(pin_src: str) -> set:
    """Entry names referenced at ACTUAL pin call sites in the plan-
    quality suite — ``_plan(spark, "<name>")`` / ``_formatted(...)``
    string args, ``load_all()["<name>"]`` subscripts, string literals
    inside ``pytest.mark.parametrize`` value lists, and literal
    tuples/lists a ``for`` loop feeds into ``_plan``/``_formatted`` —
    resolved by AST walk, not whole-file substring search (a name
    mentioned in a comment, docstring, or a sweep's exclusion list is
    not a pin)."""
    import ast

    def _call_name(fn):
        return (
            fn.id
            if isinstance(fn, ast.Name)
            else fn.attr if isinstance(fn, ast.Attribute) else None
        )

    names: set = set()
    for node in ast.walk(ast.parse(pin_src)):
        if isinstance(node, ast.For):
            # for name in ("a", "b"): ... _plan(spark, name) — a
            # literal-iterated pin loop; a loop over load_all() (the
            # whole-corpus sweeps) has no literal iter and adds nothing
            if not (
                isinstance(node.iter, (ast.Tuple, ast.List))
                and isinstance(node.target, ast.Name)
            ):
                continue
            uses_plan = any(
                isinstance(sub, ast.Call)
                and _call_name(sub.func) in ("_plan", "_formatted")
                and any(
                    isinstance(a, ast.Name) and a.id == node.target.id
                    for a in sub.args
                )
                for stmt in node.body
                for sub in ast.walk(stmt)
            )
            if uses_plan:
                names.update(
                    e.value
                    for e in node.iter.elts
                    if isinstance(e, ast.Constant) and isinstance(e.value, str)
                )
        elif isinstance(node, ast.Call):
            fname = _call_name(node.func)
            if fname in ("_plan", "_formatted"):
                for a in node.args[1:]:
                    if isinstance(a, ast.Constant) and isinstance(a.value, str):
                        names.add(a.value)
            elif fname == "parametrize":
                for a in node.args[1:]:
                    for sub in ast.walk(a):
                        if isinstance(sub, ast.Constant) and isinstance(
                            sub.value, str
                        ):
                            names.add(sub.value)
        elif isinstance(node, ast.Subscript):
            v = node.value
            if (
                isinstance(v, ast.Call)
                and isinstance(v.func, ast.Name)
                and v.func.id == "load_all"
                and isinstance(node.slice, ast.Constant)
                and isinstance(node.slice.value, str)
            ):
                names.add(node.slice.value)
    return names


def generate_operator_matrix() -> str:
    """The operator matrix, generated FROM the registry — one row per
    corpus entry with its oracle class, driver-window membership,
    plan-pin status (the entry's name appears at a pin call site in
    tests/test_plan_quality.py — see :func:`_plan_pinned_names`) and
    tags. Docs that are derived can't drift from the 160+ entries the
    way hand-maintained prose can; a test pins the committed README
    section to this output."""
    import os

    from cae_polars_tools_spark.plans.registry import (
        DRIVER_WINDOW_ORDER,
        load_all,
    )

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pin_path = os.path.join(root, "tests", "test_plan_quality.py")
    if not os.path.isfile(pin_path):
        # refusing beats silently writing '0 plan pins' into the
        # README from an installed package without the tests/ tree
        raise FileNotFoundError(
            "generate_operator_matrix: tests/test_plan_quality.py not "
            "found next to the package — docs generation is a repo-"
            "checkout operation (the plan-pin column reads that file)"
        )
    with open(pin_path) as fh:
        pin_src = fh.read()

    corpus = load_all()
    window = set(DRIVER_WINDOW_ORDER)
    n_oracle = sum(1 for s in corpus.values() if s.oracle)
    pin_names = _plan_pinned_names(pin_src)
    pinned = {n for n in corpus if n in pin_names}
    lines = [
        f"{len(corpus)} entries — {n_oracle} with value-level DuckDB "
        f"oracles, {len(corpus) - n_oracle} rows-only; "
        f"{len(window)} in the pinned driver correctness window; "
        f"{len(pinned)} with physical-plan regression pins. "
        "Generated by `python -m cae_polars_tools_spark.cli docs` — "
        "do not edit by hand.",
        "",
        "| entry | oracle | driver window | plan pin | tags |",
        "|---|---|---|---|---|",
    ]
    for name, spec in corpus.items():
        lines.append(
            "| `{}` | {} | {} | {} | {} |".format(
                name,
                "value" if spec.oracle else "rows-only",
                "yes" if name in window else "",
                "yes" if name in pinned else "",
                ", ".join(spec.tags),
            )
        )
    return "\n".join(lines)


def docs_command(args) -> int:
    """Print the generated operator matrix, or splice it into a
    markdown file between the BEGIN/END markers with ``--write``."""
    matrix = generate_operator_matrix()
    if not args.write:
        print(matrix)
        return 0
    with open(args.write) as fh:
        doc = fh.read()
    if _MATRIX_BEGIN not in doc or _MATRIX_END not in doc:
        raise SystemExit(
            f"{args.write} has no {_MATRIX_BEGIN} / {_MATRIX_END} "
            "marker pair to splice into"
        )
    head, rest = doc.split(_MATRIX_BEGIN, 1)
    _, tail = rest.split(_MATRIX_END, 1)
    with open(args.write, "w") as fh:
        fh.write(
            f"{head}{_MATRIX_BEGIN}\n{matrix}\n{_MATRIX_END}{tail}"
        )
    print(f"wrote operator matrix into {args.write}")
    return 0


def list_queries_command(args) -> int:
    """Print the registered corpus: one line per entry with its
    oracle status and tags — the engine's declared capability
    surface, greppable."""
    from cae_polars_tools_spark.plans.registry import load_all

    for name, spec in load_all().items():
        gate = "oracle" if spec.oracle else "rows-only"
        tags = ",".join(spec.tags)
        print(f"{name}\t{gate}\t{tags}")
    return 0


def query_command(args) -> int:
    """Run one registered corpus entry against a table directory:
    write Parquet (default ``{name}.parquet``) or ``--show`` rows.
    Every operator the engine claims is runnable this way without
    writing a line of code."""
    from cae_polars_tools_spark.plans.registry import load_all

    corpus = load_all()
    if args.name not in corpus:
        import difflib

        near = difflib.get_close_matches(args.name, corpus, n=3)
        hint = f" (did you mean: {', '.join(near)}?)" if near else ""
        raise SystemExit(f"unknown query {args.name!r}{hint}")
    spark = _session()
    df = corpus[args.name].build(spark, args.sf_dir)
    if args.show is not None:
        df.show(args.show, truncate=False)
        return 0
    output = args.output or f"{args.name}.parquet"
    df.write.mode("overwrite").parquet(output)
    n = spark.read.parquet(output).count()
    print(f"Wrote {n} rows x {len(df.columns)} columns to {output}")
    return 0


def explain_command(args) -> int:
    """Print one corpus entry's PHYSICAL plan (``explain('formatted')``
    by default) — the audit loop this repo's plan-quality tests grew
    out of: check that filters reached the scan (PushedFilters /
    PartitionFilters), dims broadcast, and nothing degenerated into a
    cartesian, without writing a line of code."""
    from cae_polars_tools_spark.plans.registry import load_all

    corpus = load_all()
    if args.name not in corpus:
        import difflib

        near = difflib.get_close_matches(args.name, corpus, n=3)
        hint = f" (did you mean: {', '.join(near)}?)" if near else ""
        raise SystemExit(f"unknown query {args.name!r}{hint}")
    spark = _session()
    df = corpus[args.name].build(spark, args.sf_dir)
    df.explain(args.mode)
    return 0


def create_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="cae-polars-tools-spark",
        description="PySpark-native zarr analytics engine CLI",
    )
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp):
        sp.add_argument("store_path", help="zarr store path or URL")
        sp.add_argument("--group", default=None, help="subgroup within the store")
        sp.add_argument(
            "--storage-options",
            default=None,
            help='fsspec options as JSON or k=v,k=v (e.g. \'{"anon": true}\')',
        )

    sp = sub.add_parser("info", help="store metadata as JSON (no data read)")
    common(sp)
    # Tri-state like the reference: --consolidated forces consolidated
    # metadata, --no-consolidated skips it, absent = auto-detect.
    sp.add_argument(
        "--consolidated",
        action=argparse.BooleanOptionalAction,
        default=None,
    )
    sp.add_argument("-o", "--output", default=None, help="write JSON here")
    sp.set_defaults(func=info_command)

    sp = sub.add_parser("read", help="scan an array and write Parquet")
    common(sp)
    sp.add_argument("array_name", help="array to read")
    sp.add_argument(
        "--select-dims",
        default=None,
        help="dimension selection: 'time=0:12,lat=3,lon=[0,2,4]' or a dict literal",
    )
    sp.add_argument(
        "--select-ranges",
        default=None,
        help=(
            "VALUE-based selection: 'lat=30:60,time=2020-01-01:2020-06-30' "
            "(range inclusive both ends) or a dict literal; resolved "
            "against the coordinate arrays"
        ),
    )
    sp.add_argument("--chunk-size", type=int, default=10_000)
    sp.add_argument("--no-streaming", action="store_true")
    sp.add_argument("-o", "--output", default=None, help="parquet output path")
    sp.set_defaults(func=read_command)

    sp = sub.add_parser("write", help="long-format Parquet → zarr store")
    common(sp)
    sp.add_argument("parquet_path", help="input parquet with dim + value columns")
    sp.add_argument("--value-col", default="value")
    sp.add_argument(
        "--dims",
        default=None,
        help="comma-separated dim columns in axis order (default: all non-value columns)",
    )
    sp.add_argument("--chunks", default=None, help="comma-separated chunk shape")
    sp.add_argument("--mode", choices=("overwrite", "error"), default="overwrite")
    sp.add_argument(
        "--zarr-format", type=int, choices=(2, 3), default=2
    )
    sp.add_argument(
        "--shard-chunks",
        default=None,
        help="comma-separated shard shape (implies --zarr-format 3; one "
        "sharding_indexed object per shard)",
    )
    sp.set_defaults(func=write_command)

    sp = sub.add_parser(
        "append", help="append Parquet along one dim of an existing store"
    )
    common(sp)
    sp.add_argument("parquet_path", help="input parquet with dim + value columns")
    sp.add_argument("append_dim", help="the dimension to grow (e.g. time)")
    sp.add_argument("--value-col", default="value")
    sp.set_defaults(func=append_command)

    sp = sub.add_parser("benchmark", help="time read vs materialization")
    common(sp)
    sp.add_argument("--array-name", default=None)
    sp.add_argument("--no-streaming", action="store_true")
    sp.set_defaults(func=benchmark_command)

    sp = sub.add_parser(
        "list-queries",
        help="list every registered corpus query (name, gate, tags)",
    )
    sp.set_defaults(func=list_queries_command)

    sp = sub.add_parser(
        "docs",
        help="generate the operator matrix from the registry "
        "(print, or --write README.md to splice between markers)",
    )
    sp.add_argument(
        "--write",
        default=None,
        help="markdown file to splice the matrix into (between the "
        "BEGIN/END GENERATED OPERATOR MATRIX markers)",
    )
    sp.set_defaults(func=docs_command)

    sp = sub.add_parser(
        "query", help="run a registered corpus query over a table dir"
    )
    sp.add_argument("name", help="entry name (see list-queries)")
    sp.add_argument(
        "--sf-dir",
        default="/root/testdata/sf0.001",
        help="directory holding the benchmark parquet tables",
    )
    sp.add_argument("-o", "--output", default=None, help="parquet sink path")
    sp.add_argument(
        "--show",
        type=int,
        default=None,
        metavar="N",
        help="print N rows instead of writing parquet",
    )
    sp.set_defaults(func=query_command)

    sp = sub.add_parser(
        "explain",
        help="print a corpus entry's physical plan (plan audit)",
    )
    sp.add_argument("name", help="entry name (see list-queries)")
    sp.add_argument(
        "--sf-dir",
        default="/root/testdata/sf0.001",
        help="directory holding the benchmark parquet tables",
    )
    sp.add_argument(
        "--mode",
        default="formatted",
        choices=["simple", "extended", "formatted", "cost", "codegen"],
        help="Spark explain mode (default: formatted)",
    )
    sp.set_defaults(func=explain_command)

    sp = sub.add_parser(
        "takedown",
        help="purge doc ids from a Table and its derived indexes "
        "(right-to-be-forgotten cascade)",
    )
    sp.add_argument(
        "--ids",
        required=True,
        help="comma-separated doc ids to purge",
    )
    sp.add_argument("--table", default=None, help="Table root path")
    sp.add_argument(
        "--minhash-index",
        action="append",
        default=[],
        metavar="PATH",
        help="MinHash band index root (repeatable)",
    )
    sp.add_argument(
        "--ivfpq-index",
        action="append",
        default=[],
        metavar="PATH",
        help="IVF-PQ index root (repeatable)",
    )
    sp.add_argument(
        "--id-col",
        default="doc_id",
        help="the Table's id column (indexes use their own fixed ids)",
    )
    sp.add_argument(
        "--id-type",
        choices=("auto", "int", "string"),
        default="auto",
        help="how to type the ids: 'int' requires every id to parse "
        "as an integer (loud error otherwise), 'string' passes them "
        "through verbatim (numeric-looking keys like '007' stay "
        "strings), 'auto' (default) uses ints only when ALL ids "
        "parse — a mixed list degrades to strings, so pick an "
        "explicit type when the key column's type matters",
    )
    sp.add_argument(
        "--takedown-id",
        default=None,
        help="correlation id stamped into every artifact's history "
        "record (default: random); pass the original id when "
        "retrying a partially failed cascade",
    )
    sp.set_defaults(func=takedown_command)

    sp = sub.add_parser(
        "history",
        help="audit trail of a versioned artifact (Table, MinHash "
        "index, or IVF-PQ index) as JSON — op/version/stats per "
        "commit, no data read",
    )
    sp.add_argument("path", help="artifact root path")
    sp.set_defaults(func=history_command)

    sp = sub.add_parser(
        "maintain",
        help="layout health of a versioned Table (manifest branch "
        "sprawl) as JSON; --compact runs the compaction when the "
        "branch count exceeds --max-branches",
    )
    sp.add_argument("path", help="Table root path")
    sp.add_argument(
        "--max-branches",
        type=int,
        default=16,
        help="recommend/run compaction past this many scan branches "
        "(birth directories in the current version's union plan)",
    )
    sp.add_argument(
        "--compact",
        action="store_true",
        help="actually run Table.compact() when over the threshold "
        "(default: report and recommend only)",
    )
    sp.set_defaults(func=maintain_command)

    return p


def maintain_command(args) -> int:
    """The nightly-scheduler hook as a CLI verb: report the Table's
    manifest sprawl (scan branches / files / bytes) and optionally
    reset it via compaction — `cli maintain <root> --compact`."""
    import json

    from cae_polars_tools_spark.table import Table

    from cae_polars_tools_spark.session import get_spark

    spark = get_spark(app_name="cae-polars-tools-spark-maintain")
    spark.sparkContext.setLogLevel("ERROR")
    out = Table(spark, args.path).maintain(
        max_branches=args.max_branches, auto_compact=args.compact
    )
    print(json.dumps(out, indent=1, sort_keys=True))
    return 0


def takedown_command(args) -> int:
    """One takedown request across every artifact that serves the doc
    (:func:`takedown.cascade_delete`): base table first, then each
    index, manifest to stdout as JSON. Partial failures purge what
    they can and exit 1 with the partial manifest — re-running is
    idempotent."""
    import json

    from cae_polars_tools_spark.session import get_spark
    from cae_polars_tools_spark.takedown import cascade_delete

    # --id-type decides how ids are typed (isin() must match the key
    # column by VALUE, so int-vs-string matters): 'int' is strict and
    # loud, 'string' verbatim, 'auto' keeps the historical inference
    # (ints only when every id parses — a mixed list like '7,abc'
    # degrades the whole list to strings, documented in --help)
    raw = [s.strip() for s in args.ids.split(",") if s.strip()]
    if args.id_type == "int":
        try:
            ids = [int(s) for s in raw]
        except ValueError as e:
            print(
                f"Error: --id-type int but an id does not parse: {e}",
                file=sys.stderr,
            )
            return 1
    elif args.id_type == "string":
        ids = raw
    else:
        try:
            ids = [int(s) for s in raw]
        except ValueError:
            ids = raw
    spark = get_spark(app_name="cae-polars-tools-spark-takedown")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        manifest = cascade_delete(
            spark,
            ids,
            table_root=args.table,
            minhash_index_paths=tuple(args.minhash_index),
            ivfpq_index_paths=tuple(args.ivfpq_index),
            table_id_col=args.id_col,
            takedown_id=args.takedown_id,
        )
    except RuntimeError as e:
        # partial failure: manifest of what DID purge on stdout (the
        # machine-readable channel), the failure summary on stderr,
        # exit 1 — never re-raise (str(e) would repr the whole
        # (message, manifest) tuple a second time)
        if len(e.args) > 1:
            print(json.dumps(e.args[1], indent=1, sort_keys=True))
        msg = e.args[0] if e.args else e
        print(f"Error: {msg}", file=sys.stderr)
        return 1
    print(json.dumps(manifest, indent=1, sort_keys=True))
    return 0


def history_command(args) -> int:
    """The takedown-audit read: print the artifact's commit history
    as JSON. Auto-detects the artifact kind by its pointer object —
    ``_CURRENT.json`` (Table) or ``_INDEX.json`` (MinHash / IVF-PQ
    index, distinguished by the ``format`` field). Metadata GETs
    only; for the Table the per-version ``_COMMIT.json`` sidecars are
    read, no Spark session is started and no data file is opened."""
    import json

    from cae_polars_tools_spark.sources.zarr_format import ByteStore

    root = args.path.rstrip("/")
    store = ByteStore.for_path(root)
    if store.get("_CURRENT.json") is not None:
        # Table history without a SparkSession — the ONE store-level
        # replay Table.describe_history also uses (table.py)
        from cae_polars_tools_spark.table import history_records

        print(
            json.dumps(
                {"kind": "table", "history": history_records(store)},
                indent=1,
            )
        )
        return 0
    raw = store.get("_INDEX.json")
    if raw is not None:
        meta = json.loads(raw)
        kind = (
            "ivfpq-index"
            if str(meta.get("format", "")).startswith("ivfpq")
            else "minhash-index"
        )
        print(
            json.dumps(
                {"kind": kind, "history": meta.get("history", [])},
                indent=1,
            )
        )
        return 0
    print(
        f"Error: no versioned artifact under {args.path!r} (neither "
        "_CURRENT.json nor _INDEX.json found)",
        file=sys.stderr,
    )
    return 1


def main(argv: list[str] | None = None) -> int:
    parser = create_parser()
    args = parser.parse_args(argv)
    try:
        return args.func(args)
    except Exception as e:  # errors to stderr, exit 1 (reference cli.py:94-96)
        print(f"Error: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main())

"""Guards on the bench harness's driver contract.

The round driver captures only the LAST 2000 characters of bench.py's
stdout and parses the final line as JSON. Round 4's artifact was
unparseable (``parsed: null``) because inline ``queries_min`` /
``queries_max`` pushed the single line past that window and the
truncated line started mid-JSON. These tests pin the contract without
running Spark: the corpus registry supplies the real query names, and
the line is rebuilt exactly the way ``bench.py`` builds it.
"""

from __future__ import annotations

import ast
import json
import os

from cae_polars_tools_spark.plans.registry import load_all

DRIVER_TAIL_CHARS = 2000
# Safety margin under the tail window: the metric line is the LAST
# stdout the driver reads (stray WARN lines precede it), so the slack
# only needs to cover the trailing newline and encoding variance.
BUDGET = DRIVER_TAIL_CHARS - 20

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _line(names, ndigits: int) -> str:
    return json.dumps(
        {
            "metric": "corpus_total_wall_seconds",
            "value": round(999.999, ndigits),
            "unit": "sec",
            "queries": {n: round(12.3456789, ndigits) for n in names},
            "sf": 0.1,
        },
        separators=(",", ":"),
    )


def test_stdout_line_fits_driver_tail_window():
    # bench.py prints 2-decimal values (3-decimal medians live in
    # BENCH_DETAILS.json). Worst case = every query at a 5-char value
    # (12.35); the line must fit even then.
    names = sorted(load_all())
    assert len(_line(names, 2)) <= BUDGET <= DRIVER_TAIL_CHARS


def test_headroom_for_one_more_entry():
    # Naming policy from here on: the worst-case line is within ~40
    # chars of the budget, so NEW entries keep names ≤ 14 chars (like
    # q44_first_last / mm_bmp_features); one more such entry must
    # always fit. Growing past that means trimming older post-window
    # entry names or widening the stdout contract deliberately.
    names = sorted(load_all()) + ["q45_short_name"]
    assert len(_line(names, 2)) <= BUDGET


def test_bench_source_has_no_inline_spread_keys():
    # min/max/loadavg belong in BENCH_DETAILS.json, not the stdout line.
    src = open(os.path.join(REPO, "bench.py")).read()
    tree = ast.parse(src)
    # find every dict literal passed to json.dumps inside a print call
    printed_keys: set[str] = set()
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "dumps"
            and node.args
            and isinstance(node.args[0], ast.Dict)
        ):
            keys = {
                k.value
                for k in node.args[0].keys
                if isinstance(k, ast.Constant)
            }
            if "metric" in keys:
                printed_keys |= keys
    assert printed_keys, "bench.py no longer builds the metric line?"
    assert not printed_keys & {"queries_min", "queries_max", "loadavg_start"}

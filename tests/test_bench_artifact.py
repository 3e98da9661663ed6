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
import os
import sys

from cae_polars_tools_spark.plans.registry import load_all

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import LINE_BUDGET, DRIVER_TAIL_CHARS, metric_line  # noqa: E402


def _worst_line(names) -> str:
    # Worst case: every query at a maximal-width value (12.35 / 12.3);
    # past the 1-decimal rung the window-50 fallback engages.
    return metric_line({n: 12.3456789 for n in names}, 999.999, 0.1)


def test_stdout_line_fits_driver_tail_window():
    # metric_line adaptively drops per-query precision (2 → 1
    # decimals, then the window-50 fallback); 3-decimal medians live in
    # BENCH_DETAILS.json. The real corpus must fit the budget even
    # with every value at worst-case width.
    assert LINE_BUDGET <= DRIVER_TAIL_CHARS
    assert len(_worst_line(sorted(load_all()))) <= LINE_BUDGET


def test_headroom_for_ten_more_entries():
    # Ten more 18-char-named entries must still produce a line within
    # the window — via the precision ladder or, past its floor, the
    # driver-window-50 fallback (full per-entry medians always live in
    # BENCH_DETAILS.json). The failure happens here, in CI, not in the
    # driver's artifact.
    names = sorted(load_all()) + [f"future_entry_{i:05d}" for i in range(10)]
    assert len(_worst_line(names)) <= LINE_BUDGET


def test_fallback_outranks_integer_resolution():
    # When neither 2- nor 1-decimal all-entries lines fit, the line
    # must carry the 50 driver-tracked entries at 2 decimals (the
    # round-over-round comparison set), not integers for everyone.
    import json

    names = sorted(load_all()) + [f"future_entry_{i:05d}" for i in range(10)]
    parsed = json.loads(_worst_line(names))
    if "queries_elided" in parsed:
        assert all(
            isinstance(v, float) for v in parsed["queries"].values()
        )


def test_fallback_line_fits_at_any_corpus_size():
    # The final fallback keeps only the 50 driver-tracked entries, so
    # even a doubled corpus of long names emits a parseable line that
    # reports how many entries were elided.
    import json

    names = sorted(load_all()) + [f"very_long_future_entry_{i:05d}" for i in range(100)]
    line = _worst_line(names)
    assert len(line) <= LINE_BUDGET
    parsed = json.loads(line)
    assert parsed["queries_elided"] == len(names) - len(parsed["queries"])
    assert len(parsed["queries"]) == 50


def test_full_precision_kept_while_it_fits():
    # The ladder only drops precision when forced: a small corpus
    # renders at 2 decimals.
    line = metric_line({"q01": 1.2345}, 1.234, 0.1)
    assert '"q01":1.23' in line


def test_bench_source_has_no_inline_spread_keys():
    # Per-query min/max spread belongs in BENCH_DETAILS.json, not the
    # stdout line; the two scalar host-context probes (calib_cpu_s,
    # loadavg_start) are deliberately ON the line so cross-round reads
    # need neither BENCH_DETAILS.json nor this round's forensics.
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
    assert not printed_keys & {"queries_min", "queries_max"}
    assert {"calib_cpu_s", "loadavg_start"} <= printed_keys


def test_host_context_fields_on_every_rung():
    # Both host probes must survive the precision ladder AND the
    # window-50 fallback — a contaminated-run diagnosis is most needed
    # exactly when the corpus is large.
    import json

    small = json.loads(metric_line({"q01": 1.2}, 1.2, 0.1, 0.065, 8.51))
    assert small["calib_cpu_s"] == 0.065 and small["loadavg_start"] == 8.51
    names = sorted(load_all()) + [f"very_long_future_entry_{i:05d}" for i in range(100)]
    big = json.loads(
        metric_line({n: 12.3456789 for n in names}, 999.9, 0.1, 0.065, 8.51)
    )
    assert big["calib_cpu_s"] == 0.065 and big["loadavg_start"] == 8.51


def test_spread_detector_flags_r9_drift_signature():
    # The driver's round-9 run (loadavg_start 3.32) recorded exactly
    # two drift-contaminated sample lists; the detector must flag both
    # and nothing shaped like normal variance.
    from bench import spread_flagged

    assert spread_flagged([0.593, 2.842, 4.126])  # q31_rollup, r9
    assert spread_flagged([1.482, 0.438, 0.25])  # dedup_exact, r9
    # flat entries and proportional-but-small noise never flag
    assert not spread_flagged([0.58, 0.6, 0.57])
    assert not spread_flagged([0.05, 0.16, 0.06])  # 3x ratio, tiny abs
    assert not spread_flagged([2.9, 3.1, 3.0])


def test_resampling_recovers_clean_median():
    # Simulate the r9 q31_rollup contamination: 3 loaded-host samples,
    # then `rounds` clean re-samples appended. The median over the
    # combined list must land within 2x of the entry's true cost —
    # the round-10 'no entry's median exceeds 2x its round-1 sample'
    # acceptance bar.
    import statistics

    contaminated = [0.593, 2.842, 4.126]
    clean = [0.60, 0.61, 0.59]
    med = statistics.median(contaminated + clean)
    assert med <= 2 * contaminated[0]


def test_resampler_iterates_until_median_clears():
    # r15 failure mode: the single resample batch ran on a host still
    # decaying from the main loop and came back contaminated
    # (text_logprob [0.828, 2.656, 0.805] + [3.915, 5.424, 3.072] —
    # median 2.86 vs a 0.83 s first sample). The iterative resampler
    # must keep appending batches until the median clears the
    # acceptance bar, and must call settle() before each pass.
    from bench import median_drifted, resample_until_clean

    samples = {
        "text_logprob": [0.828, 2.656, 0.805],
        "flat_entry": [0.58, 0.6, 0.57],
    }
    # first resample batch contaminated (as in r15), later ones clean
    batches = iter([3.915, 5.424, 3.072, 0.81, 0.82, 0.80])
    settles = []

    def sample_one(name):
        samples[name].append(next(batches))

    resampled = resample_until_clean(
        samples, sample_one, rounds=3, settle=lambda: settles.append(1)
    )
    assert resampled == ["text_logprob"]
    assert not median_drifted(samples["text_logprob"])
    assert len(samples["text_logprob"]) == 9  # two passes of 3
    assert len(settles) == 2  # settle ran before each pass
    assert samples["flat_entry"] == [0.58, 0.6, 0.57]  # untouched


def test_resampler_bounded_on_permanently_throttled_host():
    # A host that never recovers must not hang the harness: the pass
    # count is bounded and the entry is still reported as resampled.
    from bench import MAX_RESAMPLE_PASSES, resample_until_clean

    samples = {"hot": [0.5, 3.0, 3.1]}

    def sample_one(name):
        samples[name].append(3.0)  # never recovers

    resampled = resample_until_clean(samples, sample_one, rounds=3)
    assert resampled == ["hot"]
    assert len(samples["hot"]) == 3 + 3 * MAX_RESAMPLE_PASSES


def test_bench_details_medians_within_2x_of_first_sample():
    # Tripwire over the actual artifact: once bench.py has run with
    # the resampling logic (details carry a 'resampled' key), no
    # entry's recorded median may exceed 2x its own round-1 sample
    # (+150 ms absolute slack for sub-100 ms entries where 2x is
    # scheduler noise). Skips on pre-round-10 artifacts.
    import json
    import statistics

    import pytest

    path = os.path.join(REPO, "BENCH_DETAILS.json")
    if not os.path.exists(path):
        pytest.skip("no BENCH_DETAILS.json in checkout")
    details = json.load(open(path))
    if "resampled" not in details:
        pytest.skip("artifact predates the resampling harness")
    offenders = {
        n: ts
        for n, ts in details["queries_samples"].items()
        if statistics.median(ts) > 2 * ts[0] + 0.15
    }
    assert not offenders, f"drifted medians survived resampling: {offenders}"


def test_wait_idle_gate():
    """--wait-idle spin: returns immediately when the host is already
    quiet (threshold above current load), and respects the timeout
    instead of hanging when it never goes quiet."""
    import time

    from bench import wait_idle

    t0 = time.monotonic()
    load = wait_idle(threshold=1e9, timeout_s=60.0)
    assert time.monotonic() - t0 < 5.0
    assert load < 1e9
    # unreachable threshold: the timeout bounds the spin
    t0 = time.monotonic()
    wait_idle(threshold=-1.0, timeout_s=0.5, poll_s=0.1)
    assert 0.4 < time.monotonic() - t0 < 5.0


def test_committed_closing_artifact_is_clean():
    """BENCH_DETAILS.json is reserved for the builder's sf1-gated
    closing run (driver runs land in BENCH_DRIVER_DETAILS.json), so
    the committed file must carry the closing stamp: sf1_gate passed,
    role 'closing', and a clean-host calibration (the r11 driver run
    that shadowed the closing artifact had calib 0.145 starting at
    loadavg 5.78 rising to 17). Skips on artifacts predating the
    role stamp."""
    import json

    import pytest

    path = os.path.join(REPO, "BENCH_DETAILS.json")
    if not os.path.exists(path):
        pytest.skip("no BENCH_DETAILS.json in checkout")
    details = json.load(open(path))
    # NO legacy skip: bench.py stamps every run now, so an artifact
    # without the stamp is exactly the stale/contaminated state this
    # test exists to catch (the r11 driver run it replaced carried
    # sf1_gate "not run" at loadavg 5.78 and predated the stamp — a
    # skip here made the guard vacuous on the very file it guarded)
    assert details.get("role") == "closing", details.get("role")
    assert details["sf1_gate"] == "passed"
    # clean-calib tripwire: the builder host class probes 0.12-0.17 s
    # when quiet; a contaminated run reads high on BOTH signals
    assert details["calib_cpu_s"] < 0.2, details["calib_cpu_s"]
    assert details["loadavg_start"] < 1.5, details["loadavg_start"]


def test_driver_run_never_writes_closing_artifact():
    """The artifact-routing rule itself: a full-scale run WITHOUT the
    sf1 gate must target BENCH_DRIVER_DETAILS.json. (Source-level pin:
    the path choice keys on sf AND sf1_gate.)"""
    src = open(os.path.join(REPO, "bench.py")).read()
    assert 'if sf == 0.1 and sf1_gate:' in src
    assert 'BENCH_DRIVER_DETAILS.json' in src

"""Pin the bench stdout emission contract (VERDICT r9 #1).

The driver captures only a ~2000-byte stdout tail; the final JSON line
outgrew it in r7 AND r9 (2,430 bytes once pipeline breakdowns and
probe_stats joined the object). bench.build_slim_result is the fix:
these tests pin that a worst-case realistic result stays under
SLIM_BUDGET_BYTES so a future field cannot silently re-break parsing.
"""

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402

# The three emission modes bench.main can run in (VERDICT r10 #8): the
# warm default and the two cold scale protocols, which attach a
# DIFFERENT field mix (cold flag + calibration, no first_run_total /
# value_load_normalized). Each must independently fit the tail window.
MODES = ("warm", "sf1_cold", "sf10_cold")


def _full_out(mode: str = "sf10_cold") -> dict:
    """A worst-case realistic full result for ``mode``: every field
    bench.main can attach on that path, every HEADLINE/PIPELINE query
    present, max-width floats."""
    queries = {name: 123.456 for name in bench.HEADLINE}
    pipeline = {name: 123.456 for name in bench.PIPELINE}
    out = {
        "metric": {
            "warm": "headline_queries_total",
            "sf1_cold": "headline_queries_total_sf1_cold",
            "sf10_cold": "headline_queries_total_sf10_cold",
        }[mode],
        "value": 12345.678,
        "unit": "sec",
        "queries": queries,
        "sf": {"warm": 0.1, "sf1_cold": 1.0, "sf10_cold": 10.0}[mode],
        "pipeline_total": 12345.678,
        "pipeline_queries": pipeline,
        "errors": {name: "x" * 200 for name in bench.HEADLINE},
        "probe_stats": {
            name: {"probe_ms": 12345.6, "memo_misses": 10, "memo_hits": 10}
            for name in bench.HEADLINE
        },
        "calibration": {
            "query": "global_agg",
            "ref_sec": 0.125,
            "probe_before_sec": 1234.5678,
            "probe_after_sec": 1234.5678,
            "load_factor": 123.456,
        },
    }
    if mode == "warm":
        out["first_run_total"] = 12345.678
        out["first_runs"] = queries
        out["pipeline_first_runs"] = pipeline
        out["value_load_normalized"] = 12345.678
    else:
        out["cold"] = True
    return out


@pytest.mark.parametrize("mode", MODES)
def test_slim_line_fits_driver_tail_window(mode):
    slim = bench.build_slim_result(_full_out(mode))
    line = json.dumps(slim, separators=(",", ":"))
    assert len(line) <= bench.SLIM_BUDGET_BYTES, (
        f"slim stdout line ({mode}) is {len(line)} bytes — over the "
        f"{bench.SLIM_BUDGET_BYTES}-byte budget; the driver's ~2000-byte "
        "tail window WILL clip it (this broke BENCH_r07 and BENCH_r09). "
        "Move the new field into bench_result.json instead."
    )


@pytest.mark.parametrize("mode", [m for m in MODES if m != "warm"])
def test_slim_cold_modes_keep_cold_fields(mode):
    slim = bench.build_slim_result(_full_out(mode))
    assert slim["cold"] is True
    assert slim["calibration"]["load_factor"] == 123.456
    assert slim["metric"].endswith("_cold")


def test_slim_keeps_contract_fields():
    slim = bench.build_slim_result(_full_out("warm"))
    # The driver brief's documented line shape.
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in slim
    # The judge's cross-round comparators.
    for key in ("calibration", "value_load_normalized", "pipeline_total"):
        assert key in slim
    assert slim["calibration"]["load_factor"] == 123.456
    # Breakdown payloads must NOT leak onto stdout.
    for key in ("first_runs", "pipeline_queries", "pipeline_first_runs",
                "probe_stats", "errors"):
        assert key not in slim
    assert slim["error_count"] == len(bench.HEADLINE)


def test_slim_degrades_by_dropping_queries_first():
    out = _full_out()
    # Simulate pathological growth: enormous query names.
    out["queries"] = {f"q_{'x' * 200}_{i}": 1.0 for i in range(20)}
    slim = bench.build_slim_result(out)
    assert "queries" not in slim
    assert "value" in slim and "calibration" in slim
    assert len(json.dumps(slim, separators=(",", ":"))) <= bench.SLIM_BUDGET_BYTES


def test_slim_omits_absent_optionals():
    out = {"metric": "m", "value": 1.0, "unit": "sec", "sf": 0.1,
           "queries": {"a": 1.0}}
    slim = bench.build_slim_result(out)
    assert slim == out

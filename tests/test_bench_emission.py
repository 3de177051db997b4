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

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


def _full_out() -> dict:
    """A worst-case realistic full result: every field bench.main can
    attach, every HEADLINE/PIPELINE query present, max-width floats."""
    queries = {name: 123.456 for name in bench.HEADLINE}
    pipeline = {name: 123.456 for name in bench.PIPELINE}
    return {
        "metric": "headline_queries_total_sf10_cold",
        "value": 12345.678,
        "unit": "sec",
        "queries": queries,
        "sf": 10.0,
        "pipeline_total": 12345.678,
        "pipeline_queries": pipeline,
        "errors": {name: "x" * 200 for name in bench.HEADLINE},
        "probe_stats": {
            name: {"probe_ms": 12345.6, "memo_misses": 10, "memo_hits": 10}
            for name in bench.HEADLINE
        },
        "cold": True,
        "first_run_total": 12345.678,
        "first_runs": queries,
        "pipeline_first_runs": pipeline,
        "calibration": {
            "query": "global_agg",
            "ref_sec": 0.125,
            "probe_before_sec": 1234.5678,
            "probe_after_sec": 1234.5678,
            "load_factor": 123.456,
        },
        "value_load_normalized": 12345.678,
    }


def test_slim_line_fits_driver_tail_window():
    slim = bench.build_slim_result(_full_out())
    line = json.dumps(slim, separators=(",", ":"))
    assert len(line) <= bench.SLIM_BUDGET_BYTES, (
        f"slim stdout line is {len(line)} bytes — over the "
        f"{bench.SLIM_BUDGET_BYTES}-byte budget; the driver's ~2000-byte "
        "tail window WILL clip it (this broke BENCH_r07 and BENCH_r09). "
        "Move the new field into bench_result.json instead."
    )


def test_slim_keeps_contract_fields():
    slim = bench.build_slim_result(_full_out())
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

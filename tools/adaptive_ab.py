#!/usr/bin/env python
"""Idle A/B of the adaptive dedup entries vs their fenced twins at
sf0.1 (VERDICT r8 #3 — settle whether the r8 warm-median drift on
dedup_{minhash_lsh,simhash,embedding_cosine} was ambient load or the
dup-mass probe). For each family this times, warm (median of N):

- the adaptive entry (collapse_exact="auto" — probe memo-hit on warm
  runs),
- its _direct twin (probe forced OFF),
- its _collapsed twin where registered (probe forced ON path),

and reports the probe counters (hits/misses/total probe seconds) so the
steady-state claim — warm medians are probe-free — is checked against
the memo, not inferred. Prints one JSON line; run on an idle box (it
also emits the standard load calibration so the row is interpretable).

Usage: python tools/adaptive_ab.py [runs]   (default 5)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ADVICE r9: share the pinned idle-condition probe median with bench.py
# so a re-pin there can never leave this tool reporting stale factors.
from bench import CALIBRATION_REF  # noqa: E402

# minhash has no fenced _direct/_collapsed catalog twins (the r8 pins
# cover simhash/ngram/embedding); its adaptive entry still reports the
# probe counters, which is the A/B's real question.
FAMILIES = {
    "minhash": ["dedup_minhash_lsh"],
    "simhash": ["dedup_simhash", "dedup_simhash_direct", "dedup_simhash_collapsed"],
    "embedding": [
        "dedup_embedding_cosine",
        "dedup_embedding_cosine_direct",
        "dedup_embedding_cosine_collapsed",
    ],
}


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = "/root/testdata/sf0.001"

    from esther_apache_spark_spark import plans
    from esther_apache_spark_spark.operators.dedup import AUTO_PROBE_STATS
    from esther_apache_spark_spark.session import get_spark

    spark = get_spark("adaptive-ab")
    spark.sparkContext.setLogLevel("ERROR")
    n = spark.sparkContext.defaultParallelism

    def _ident(it):
        yield from it

    spark.range(0, n, 1, n).mapInPandas(_ident, "id long").count()

    def _time_query(name: str) -> dict:
        spec = plans.QUERIES.get(name)
        if spec is None:
            return {"missing": True}
        spec.fn(spark, warm_dir).count()
        spec.fn(spark, sf_dir).count()  # first touch outside the median
        ps0 = dict(AUTO_PROBE_STATS)
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        return {
            "median_sec": round(statistics.median(samples), 3),
            "min_sec": round(min(samples), 3),
            "probe_ms_during_median_runs": round(
                (AUTO_PROBE_STATS["probe_sec"] - ps0["probe_sec"]) * 1000, 1
            ),
            "memo_misses": AUTO_PROBE_STATS["misses"] - ps0["misses"],
            "memo_hits": AUTO_PROBE_STATS["hits"] - ps0["hits"],
        }

    cal_spec = plans.QUERIES["global_agg"]
    cal_spec.fn(spark, warm_dir).count()
    cal_spec.fn(spark, sf_dir).count()

    def _cal() -> float:
        s = []
        for _ in range(5):
            t0 = time.perf_counter()
            cal_spec.fn(spark, sf_dir).count()
            s.append(time.perf_counter() - t0)
        return statistics.median(s)

    before = _cal()
    out = {"sf_dir": sf_dir, "runs": runs, "families": {}}
    for fam, names in FAMILIES.items():
        out["families"][fam] = {nm: _time_query(nm) for nm in names}
        print(f"[ab] {fam}: {out['families'][fam]}", file=sys.stderr, flush=True)
    after = _cal()
    out["calibration"] = {
        "probe_before_sec": round(before, 4),
        "probe_after_sec": round(after, 4),
        "load_factor": round(
            statistics.median([before, after]) / CALIBRATION_REF, 3
        ),
    }
    spark.stop()
    print(json.dumps(out, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()

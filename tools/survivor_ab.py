#!/usr/bin/env python
"""Idle A/B of the survivor family at sf0.1: HEAD's hardened
``_quotient_labels`` (999b8b8: left join + coalesce on the group-size
frame, final member join over the FULL map) vs the r8 semantics
(inner join on gsz, final join over intra-eligible members) — settles
the r9 watch item (``lexical_dedup_survivors`` 5.94 → 7.48 s, +26%,
while its semantic sibling IMPROVED): ambient load, or the hardening?

Each arm runs the two survivor entries N times warm (median + first
run) with the standard calibration probe before/after, in ONE session
(the r8 variant is a faithful in-process monkeypatch of
``dedup._quotient_labels`` — all three call sites resolve it at call
time). Prints one JSON line; run on an idle box.

Usage: python tools/survivor_ab.py [runs]   (default 3)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CALIBRATION_REF  # noqa: E402

QUERIES = ["lexical_dedup_survivors", "semantic_dedup_survivors"]


def _r8_quotient_labels(
    rep_pairs,
    groups,
    members,
    id_col,
    key_col,
    intra_members=None,
    max_iter=25,
    checkpoint_dir=None,
):
    """The PRE-999b8b8 semantics, reconstructed for the A/B: inner join
    on the group-size frame, plain _gn filter, final join over im."""
    from pyspark.sql import functions as F

    from esther_apache_spark_spark.operators.components import (
        connected_components,
    )

    im = intra_members if intra_members is not None else members
    rep_lab = connected_components(
        rep_pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        max_iter=max_iter,
        checkpoint_dir=checkpoint_dir,
    ).withColumnRenamed("node", "_rep")
    gsz = im.groupBy(key_col).agg(F.count(F.lit(1)).alias("_gn"))
    glab = (
        groups.select(F.col(id_col).alias("_rep"), key_col)
        .join(gsz, key_col)
        .join(rep_lab, "_rep", "left")
        .filter(F.col("comp").isNotNull() | (F.col("_gn") >= 2))
        .select(key_col, F.coalesce("comp", "_rep").alias("comp"))
    )
    return im.join(glab, key_col).select(F.col("_mid").alias("node"), "comp")


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = "/root/testdata/sf0.001"

    from esther_apache_spark_spark import plans
    from esther_apache_spark_spark.operators import dedup as D
    from esther_apache_spark_spark.session import get_spark

    spark = get_spark("survivor-ab")
    spark.sparkContext.setLogLevel("ERROR")

    def _cal() -> float:
        # the ONE probe protocol, imported from bench (a drift here
        # would desynchronize this tool's load factor from bench's)
        from bench import calibration_probe

        return calibration_probe(spark, sf_dir)

    original = D._quotient_labels

    def _one(name: str, variant) -> float:
        D._quotient_labels = variant
        try:
            t0 = time.perf_counter()
            plans.QUERIES[name].fn(spark, sf_dir).count()
            return time.perf_counter() - t0
        finally:
            D._quotient_labels = original

    # Warm both variants' codegen/caches at sf0.001 first, then
    # INTERLEAVE arms per repetition — the first cut ran arm A fully
    # before arm B and a decaying load transient landed entirely on A
    # (probes 0.91 → 0.15 s), which is exactly the confound the watch
    # item is about.
    for name in QUERIES:
        plans.QUERIES[name].fn(spark, warm_dir).count()
    samples: dict[str, dict[str, list[float]]] = {
        n: {"head": [], "r8": []} for n in QUERIES
    }
    probes = [_cal()]
    for i in range(runs):
        for name in QUERIES:
            for label, variant in (
                ("head", original), ("r8", _r8_quotient_labels)
            ):
                s = _one(name, variant)
                samples[name][label].append(s)
                print(
                    f"[ab:{label}] {name} run{i} = {s:.3f}s",
                    file=sys.stderr, flush=True,
                )
        probes.append(_cal())

    def _summ(vals: list[float]) -> dict:
        return {
            "median": round(statistics.median(vals), 3),
            "first": round(vals[0], 3),
            "all": [round(s, 3) for s in vals],
        }

    out = {
        "sf_dir": sf_dir,
        "runs": runs,
        "head": {n: _summ(samples[n]["head"]) for n in QUERIES},
        "r8_semantics": {n: _summ(samples[n]["r8"]) for n in QUERIES},
        "calibration": {
            "probes_sec": [round(p, 4) for p in probes],
            "load_factor": round(statistics.median(probes) / CALIBRATION_REF, 3),
        },
    }
    spark.stop()
    print(json.dumps(out, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()

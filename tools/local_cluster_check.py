#!/usr/bin/env python
"""local-cluster verification tier (VERDICT r8 #2).

Everything else in this repo runs ``local[k]``, where executors share
the driver JVM — Java/Arrow serialization bugs, closure-capture bugs,
and accidental driver-state coupling (e.g. a Python callback touching
driver-only files) are INVISIBLE there. This script re-runs the frozen
bench sets under ``master=local-cluster[2,8,4096]`` — two real separate
executor JVM processes with their own python workers, no new hardware —
with reliable disk checkpoints on, and checks each query's ROW COUNT
against the DuckDB oracle (value hashing is the driver/pytest tier's
job; this tier exists to catch distribution bugs, which show up as
crashes, serialization errors, or lost rows).

Usage:
    python tools/local_cluster_check.py [sf_dir]      # default sf0.01
Prints one JSON line: {"ok": bool, "ran": n, "failures": {...}, ...}.
Exit code 0 iff every query ran and row counts matched.

Scale notes: local-cluster is Spark's own test harness for exactly this
gap (real BlockManager transfers, real executor-side class loading,
real task-result serialization over the wire). What it still cannot
exercise: multi-NODE shuffle IO and executor LOSS mid-query — the
checkpointed CC rounds are loss-survivable by construction (reliable
checkpoints on shared storage), but only a real cluster kills a JVM
under load.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    os.environ.setdefault("SPARK_GRAFT_CHECKPOINT_DIR", "/tmp/spark_graft_ckpt_lc")

    import duckdb

    import bench
    from esther_apache_spark_spark import plans
    from esther_apache_spark_spark.session import get_spark

    spark = get_spark(
        "local-cluster-check",
        master="local-cluster[2,8,4096]",
        shuffle_partitions=16,
        extra_conf={"spark.executor.memory": "3g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    # beyond the frozen bench sets: the r9 incremental-index family —
    # applyInPandas cross-GEMM, parquet index probe, CC and a streaming
    # foreachBatch sink all crossing real executor-process boundaries
    extras = [
        "incremental_minhash_dedup_new_docs",
        "incremental_semantic_dedup_new_docs",
        "streaming_minhash_novelty_docs",
    ]
    names = bench.HEADLINE + bench.PIPELINE + extras
    failures: dict[str, str] = {}
    timings: dict[str, float] = {}
    for name in names:
        spec = plans.QUERIES[name]
        t0 = time.perf_counter()
        try:
            got = spec.fn(spark, sf_dir).count()
        except Exception as exc:  # noqa: BLE001 — record every query
            failures[name] = f"spark-err {str(exc).splitlines()[0][:200]}"
            print(f"[lc] {name} FAILED: {failures[name]}", file=sys.stderr, flush=True)
            continue
        timings[name] = round(time.perf_counter() - t0, 3)
        if spec.oracle:
            want = con.execute(
                f"SELECT COUNT(*) FROM ({spec.oracle})"
            ).fetchone()[0]
            if got != want:
                failures[name] = f"rows {got} vs oracle {want}"
                print(f"[lc] {name} ROW MISMATCH: {failures[name]}", file=sys.stderr, flush=True)
                continue
        print(f"[lc] {name} ok rows={got} ({timings[name]}s)", file=sys.stderr, flush=True)

    spark.stop()
    out = {
        "ok": not failures,
        "master": "local-cluster[2,8,4096]",
        "sf_dir": sf_dir,
        "ran": len(names),
        "failed": len(failures),
        "failures": failures,
        "total_sec": round(sum(timings.values()), 3),
    }
    print(json.dumps(out, separators=(",", ":")), flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

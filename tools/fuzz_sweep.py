#!/usr/bin/env python
"""Bulk differential-fuzz sweep: run a seed RANGE of generated queries
(esther_apache_spark_spark/fuzz.py) through Spark and DuckDB and compare
bit-for-bit — the ad-hoc sweep previous rounds ran by hand, made
reproducible. The pytest tier pins seeds 0-119 permanently; this tool
is for fresh multi-thousand-seed sweeps on ranges nobody has run
before (a failure prints the seed + SQL, a one-line repro).

Prints one JSON line. Exit 0 iff every seed agreed.

Usage: python tools/fuzz_sweep.py START COUNT [sf_dir]
       (e.g. python tools/fuzz_sweep.py 16000 2000)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    start = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    count = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"

    import duckdb

    from esther_apache_spark_spark import fuzz
    from esther_apache_spark_spark.schemas import load_table
    from esther_apache_spark_spark.session import get_spark

    spark = get_spark("fuzz-sweep", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    duck = duckdb.connect()
    for t in fuzz.TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    fp = fuzz.ensure_nullish(tempfile.mkdtemp(prefix="fuzz_sweep_"))
    spark.read.parquet(fp).createOrReplaceTempView("nullish")
    duck.execute(
        f"CREATE VIEW nullish AS SELECT * FROM read_parquet('{fp}')"
    )
    stats = fuzz.build_stats(sf_dir)

    t0 = time.perf_counter()
    failures: list[dict] = []
    for seed in range(start, start + count):
        sql = fuzz.generate_query(seed, stats)
        try:
            got = fuzz.canonicalize(spark.sql(sql).toPandas())
            want = fuzz.canonicalize(duck.execute(sql).df())
            ok = (
                list(got.columns) == list(want.columns)
                and len(got) == len(want)
                and got.equals(want)
            )
        except Exception as e:  # noqa: BLE001
            failures.append(
                {"seed": seed, "sql": sql,
                 "err": f"{type(e).__name__}: {e}"[:300]}
            )
            continue
        if not ok:
            failures.append({"seed": seed, "sql": sql, "err": "mismatch"})
        if (seed - start + 1) % 250 == 0:
            print(
                f"[sweep] {seed - start + 1}/{count} "
                f"({len(failures)} failures)",
                file=sys.stderr, flush=True,
            )

    out = {
        "start": start,
        "count": count,
        "sf_dir": sf_dir,
        "failures": len(failures),
        "first_failures": failures[:5],
        "wall_sec": round(time.perf_counter() - t0, 1),
    }
    print(json.dumps(out))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

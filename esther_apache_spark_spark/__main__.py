"""CLI — the runnable face of the engine (the reference is a script,
``python src/pyspark/pipeline_pyspark.py``; this is the equivalent entry
point for the library form).

    python -m esther_apache_spark_spark list
    python -m esther_apache_spark_spark run <query> [--sf-dir DIR] [-n N]
    python -m esther_apache_spark_spark explain <query> [--sf-dir DIR]
    python -m esther_apache_spark_spark freshkart [--out DIR]
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="esther_apache_spark_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list catalog queries (o = DuckDB-oracled)")

    runp = sub.add_parser("run", help="run a catalog query and show rows")
    runp.add_argument("query")
    runp.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    )
    runp.add_argument("-n", type=int, default=20, help="rows to show")

    exp = sub.add_parser("explain", help="print a query's physical plan")
    exp.add_argument("query")
    exp.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    )

    fk = sub.add_parser("freshkart", help="replay the reference pipeline on the seeded fixture")
    fk.add_argument("--out", default="/tmp/freshkart_out")
    fk.add_argument(
        "--settings",
        default=None,
        help="reference-shaped settings.yaml: paths + CSV dialect drive the run",
    )

    fz = sub.add_parser(
        "fuzz", help="differential fuzz sweep: generated SQL, Spark vs DuckDB"
    )
    fz.add_argument("--seeds", type=int, default=500, help="number of seeds to run")
    fz.add_argument("--start", type=int, default=0, help="first seed")
    fz.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    )

    args = p.parse_args(argv)

    from esther_apache_spark_spark import plans
    from esther_apache_spark_spark.session import get_spark

    if args.cmd == "list":
        for name in sorted(plans.QUERIES):
            spec = plans.QUERIES[name]
            mark = "o" if spec.oracle else " "
            doc = spec.doc.split("\n")[0][:70]
            print(f"[{mark}] {name:40s} {doc}")
        return 0

    spark = get_spark("esther-cli")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd in ("run", "explain"):
        if args.query not in plans.QUERIES:
            print(f"unknown query: {args.query} (see `list`)", file=sys.stderr)
            return 2
        df = plans.QUERIES[args.query].fn(spark, args.sf_dir)
        if args.cmd == "explain":
            df.explain("formatted")
        else:
            df.show(args.n, truncate=False)
        return 0

    if args.cmd == "fuzz":
        import duckdb

        from esther_apache_spark_spark import fuzz
        from esther_apache_spark_spark.schemas import load_table

        for t in fuzz.TABLES:
            load_table(spark, args.sf_dir, t).createOrReplaceTempView(t)
        con = duckdb.connect()
        for t in fuzz.TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{args.sf_dir}/{t}.parquet')"
            )
        fp = fuzz.ensure_nullish("/tmp/esther_fuzz_fixtures")
        spark.read.parquet(fp).createOrReplaceTempView("nullish")
        con.execute(
            f"CREATE VIEW nullish AS SELECT * FROM read_parquet('{fp}')"
        )
        stats = fuzz.build_stats(args.sf_dir)
        seeds = range(args.start, args.start + args.seeds)
        failures = fuzz.run_differential(spark, con, stats, seeds)
        print(f"{len(seeds) - len(failures)}/{len(seeds)} seeds match")
        for seed, sql, err in failures:
            print(f"--- seed={seed}: {err}\n    {sql}")
        return 1 if failures else 0

    if args.cmd == "freshkart":
        if args.settings:
            from esther_apache_spark_spark.settings import run_freshkart_from_settings

            res = run_freshkart_from_settings(spark, args.settings)
            print(f"FreshKart outputs written under {res['config']['output_dir']}")
            return 0
        from esther_apache_spark_spark.freshkart.fixture import ensure_fixture
        from esther_apache_spark_spark.freshkart.pipeline import (
            run_freshkart_pipeline,
            write_freshkart_outputs,
        )

        fixture = ensure_fixture()
        result = run_freshkart_pipeline(spark, fixture)
        write_freshkart_outputs(result, args.out, f"{args.out}/freshkart.db")
        print(f"FreshKart outputs written under {args.out}")
        return 0

    return 2


if __name__ == "__main__":
    raise SystemExit(main())

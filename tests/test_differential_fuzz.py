"""Differential fuzzing: seeded generated queries, Spark vs DuckDB.

Complements the fixed catalog oracles with *generated* coverage — each
seed expands deterministically (see `esther_apache_spark_spark/fuzz.py`)
into a filter/project, group-by, FK join, window, set-op, EXISTS, or
top-k query in the dialect subset where both engines must agree
bit-for-bit. A failure message carries the seed and the SQL, so any
divergence is a one-line repro.
"""

from __future__ import annotations

import pytest

from esther_apache_spark_spark import fuzz

SEEDS = range(120)


@pytest.fixture(scope="session")
def fuzz_stats(sf_dir):
    return fuzz.build_stats(sf_dir)


@pytest.fixture(scope="session")
def spark_fuzz_views(spark, sf_dir):
    from esther_apache_spark_spark.schemas import load_table

    for t in fuzz.TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    yield
    for t in fuzz.TABLES:
        spark.catalog.dropTempView(t)


@pytest.mark.parametrize("seed", SEEDS)
def test_generated_query_matches_duckdb(seed, spark, duck, fuzz_stats, spark_fuzz_views):
    sql = fuzz.generate_query(seed, fuzz_stats)
    got = fuzz.canonicalize(spark.sql(sql).toPandas())
    want = fuzz.canonicalize(duck.execute(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"seed={seed} column mismatch\nSQL: {sql}\n"
        f"spark={list(got.columns)} duckdb={list(want.columns)}"
    )
    assert len(got) == len(want), (
        f"seed={seed} row count {len(got)} vs {len(want)}\nSQL: {sql}"
    )
    if not got.equals(want):
        diff_mask = (got != want).any(axis=1)
        sample = got[diff_mask].head(5).to_dict("records")
        sample_want = want[diff_mask].head(5).to_dict("records")
        raise AssertionError(
            f"seed={seed} value mismatch\nSQL: {sql}\n"
            f"spark rows: {sample}\nduckdb rows: {sample_want}"
        )


def test_generator_is_deterministic(fuzz_stats):
    for seed in (0, 7, 63, 119):
        assert fuzz.generate_query(seed, fuzz_stats) == fuzz.generate_query(
            seed, fuzz_stats
        )

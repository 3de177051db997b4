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

# fuzz tier (VERDICT r10 #2): excluded from the default fast tier;
# run with --full-tests / SPARK_GRAFT_FULL_TESTS=1 (the round-close gate)
pytestmark = pytest.mark.fuzz

SEEDS = range(120)


@pytest.fixture(scope="session")
def fuzz_stats(sf_dir):
    return fuzz.build_stats(sf_dir)


@pytest.fixture(scope="session")
def spark_fuzz_views(spark, duck, sf_dir, tmp_path_factory):
    from esther_apache_spark_spark.schemas import load_table

    for t in fuzz.TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    fp = fuzz.ensure_nullish(str(tmp_path_factory.mktemp("fuzz_fixtures")))
    spark.read.parquet(fp).createOrReplaceTempView("nullish")
    duck.execute(
        f"CREATE OR REPLACE VIEW nullish AS SELECT * FROM read_parquet('{fp}')"
    )
    yield
    for t in list(fuzz.TABLES) + ["nullish"]:
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


def test_known_divergence_cube_on_empty_input(spark, duck, spark_fuzz_views):
    """A real dialect divergence the fuzzer surfaced (seed 900 of the
    pre-HAVING grammar): GROUP BY CUBE/ROLLUP over an EMPTY input. The
    SQL standard's ()-grouping-set aggregates the whole (empty) input
    into one grand-total group, so DuckDB returns one row of NULL keys
    with count 0; Spark propagates the empty relation through the
    Expand and returns zero rows. This test pins both behaviors so a
    change in either engine is noticed; the generator masks the case
    with HAVING COUNT(*) > 0 (a no-op for every non-empty group)."""
    sql = (
        "SELECT o_orderstatus AS k0, CAST(COUNT(*) AS BIGINT) AS cnt "
        "FROM orders WHERE o_orderkey < 0 GROUP BY CUBE(o_orderstatus)"
    )
    assert spark.sql(sql).count() == 0  # Spark: empty-relation propagation
    want = duck.execute(sql).df()
    assert len(want) == 1 and int(want["cnt"][0]) == 0  # DuckDB: standard
    # the generator's HAVING guard reconciles the two
    guarded = sql + " HAVING COUNT(*) > 0"
    assert spark.sql(guarded).count() == 0
    assert len(duck.execute(guarded).df()) == 0


def test_generator_is_deterministic(fuzz_stats):
    for seed in (0, 7, 63, 119):
        assert fuzz.generate_query(seed, fuzz_stats) == fuzz.generate_query(
            seed, fuzz_stats
        )

"""S6/K3 JDBC round-trip (VERDICT r01 item 8).

The container ships no RDBMS server and pip/apt installs are off, so the
JDBC path is exercised against an embedded DuckDB database file IF a
``duckdb_jdbc`` driver jar (a public Maven Central artifact) can be
discovered in the usual local artifact caches; otherwise the test skips
with an explicit reason — the honest "unsupported in this container"
marker. The driver jar must be on the JVM classpath at session creation,
which the long-lived test session can't retrofit — so the round-trip
runs in a fresh subprocess with its own SparkSession.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import textwrap

import pytest

# slow tier (VERDICT r10 #2): excluded from the default fast tier;
# run with --full-tests / SPARK_GRAFT_FULL_TESTS=1 (the round-close gate)
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _find_jdbc_jar() -> str | None:
    for pat in (
        "~/.cache/coursier/**/duckdb_jdbc*.jar",
        "~/.ivy2/**/duckdb_jdbc*.jar",
        "~/.m2/**/duckdb_jdbc*.jar",
    ):
        hits = glob.glob(os.path.expanduser(pat), recursive=True)
        if hits:
            return sorted(hits)[0]
    return None


def test_jdbc_write_then_read_round_trip(tmp_path):
    jar = _find_jdbc_jar()
    if jar is None:
        pytest.skip("no JDBC driver jar discoverable in this container")
    db = str(tmp_path / "roundtrip.duckdb")
    # mode="overwrite" would have Spark CREATE the table, but the DuckDB
    # JDBC driver's create-then-insert across two connections races its
    # embedded-instance cache ("Table ... does not exist"); the reference
    # pattern (an existing RDBMS schema, Spark appends) pre-creates the
    # table and uses mode="append" — which also matches freshkartmindump.sql
    # bootstrapping the schema before any pipeline write.
    script = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, {REPO!r})
        import duckdb
        from pyspark.sql import SparkSession

        from esther_apache_spark_spark.sources.readers import read_jdbc
        from esther_apache_spark_spark.sources.sinks import write_jdbc

        con = duckdb.connect({db!r})
        con.execute("CREATE TABLE t (id BIGINT, name VARCHAR, v DOUBLE)")
        con.close()  # release the file lock before the JVM opens it

        spark = (
            SparkSession.builder.master("local[2]")
            .appName("jdbc-roundtrip")
            .config("spark.driver.extraClassPath", {jar!r})
            .config("spark.ui.enabled", "false")
            .config("spark.sql.shuffle.partitions", "2")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        df = spark.createDataFrame(
            [(1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5)],
            "id long, name string, v double",
        ).coalesce(1)  # duckdb file DBs are single-writer
        url = "jdbc:duckdb:" + {db!r}
        props = {{"driver": "org.duckdb.DuckDBDriver"}}
        write_jdbc(df, url, "t", mode="append", properties=props)
        back = read_jdbc(spark, url, "t", properties=props)
        # the driver surfaces BIGINT as DECIMAL metadata -> normalize to int
        rows = sorted((int(r["id"]), r["name"], float(r["v"])) for r in back.collect())
        assert rows == [(1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5)], rows
        print("JDBC_OK", len(rows))
        spark.stop()
        """
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "JDBC_OK 3" in proc.stdout


def test_jdbc_partitioned_read_parallel_tasks(tmp_path):
    """Partitioned JDBC ingest: numPartitions>1 must yield that many
    input partitions (concurrent range queries), cover rows OUTSIDE the
    given bounds (they fall into the edge partitions), and return the
    same rows as the single-task read."""
    jar = _find_jdbc_jar()
    if jar is None:
        pytest.skip("no JDBC driver jar discoverable in this container")
    db = str(tmp_path / "part.duckdb")
    script = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, {REPO!r})
        import duckdb
        from pyspark.sql import SparkSession

        from esther_apache_spark_spark.sources.readers import read_jdbc

        con = duckdb.connect({db!r})
        con.execute("CREATE TABLE t AS SELECT range AS id, range * 1.5 AS v FROM range(200)")
        con.close()

        spark = (
            SparkSession.builder.master("local[4]")
            .appName("jdbc-partitioned")
            .config("spark.driver.extraClassPath", {jar!r})
            .config("spark.ui.enabled", "false")
            .config("spark.sql.shuffle.partitions", "4")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        url = "jdbc:duckdb:" + {db!r}
        props = {{"driver": "org.duckdb.DuckDBDriver"}}
        # bounds deliberately INSIDE the id range: rows below 50 /
        # above 150 must still arrive via the unbounded edge partitions
        part = read_jdbc(
            spark, url, "t", properties=props,
            partition_column="id", lower_bound=50, upper_bound=150,
            num_partitions=4,
        )
        assert part.rdd.getNumPartitions() == 4, part.rdd.getNumPartitions()
        single = read_jdbc(spark, url, "t", properties=props)
        prows = sorted((int(r["id"]), float(r["v"])) for r in part.collect())
        srows = sorted((int(r["id"]), float(r["v"])) for r in single.collect())
        assert len(prows) == 200, len(prows)
        assert prows == srows
        print("JDBC_PART_OK", len(prows))
        spark.stop()
        """
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "JDBC_PART_OK 200" in proc.stdout


def test_jdbc_filter_pushdown_reaches_scan(tmp_path):
    """Predicates on a JDBC relation must reach the remote engine as
    PushedFilters (the scan's WHERE runs in the RDBMS, so only matching
    rows cross the wire) — at scale the difference between shipping a
    table and shipping a result."""
    jar = _find_jdbc_jar()
    if jar is None:
        pytest.skip("no JDBC driver jar discoverable in this container")
    db = str(tmp_path / "pushdown.duckdb")
    script = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, {REPO!r})
        import duckdb
        from pyspark.sql import SparkSession
        from pyspark.sql import functions as F

        from esther_apache_spark_spark.sources.readers import read_jdbc

        con = duckdb.connect({db!r})
        con.execute("CREATE TABLE t AS SELECT range AS id, range % 10 AS k FROM range(1000)")
        con.close()

        spark = (
            SparkSession.builder.master("local[2]")
            .appName("jdbc-pushdown")
            .config("spark.driver.extraClassPath", {jar!r})
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        url = "jdbc:duckdb:" + {db!r}
        props = {{"driver": "org.duckdb.DuckDBDriver"}}
        df = read_jdbc(spark, url, "t", properties=props).filter(F.col("k") == 3).select("id")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan and "k" in plan.split("PushedFilters")[1][:80], plan
        assert df.count() == 100
        print("PUSHDOWN_OK")
        spark.stop()
        """
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "PUSHDOWN_OK" in proc.stdout

"""Crash-injection tests for the atomic-publish manifest sink
(sources/sinks.py publish_parquet_atomic): a publisher process is
SIGKILLed (os._exit, no cleanup) at every protocol stage and the
canonical path must always read as either the OLD or the NEW complete
dataset — never torn, never absent after recovery.

The publisher runs in a SUBPROCESS (its own SparkSession) because a
genuine crash must not tear down the test session.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

import pytest

from esther_apache_spark_spark.sources.sinks import (
    manifest_valid,
    publish_parquet_atomic,
    read_published,
    recover_publish,
)

_PUBLISH_SCRIPT = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    from esther_apache_spark_spark.session import get_spark
    from esther_apache_spark_spark.sources.sinks import publish_parquet_atomic

    spark = get_spark("crash-publisher", shuffle_partitions=2)
    df = spark.range({lo}, {hi}).selectExpr("id", "id * 2 AS v")
    publish_parquet_atomic(df, {path!r})
    """
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _publish_subprocess(path: str, lo: int, hi: int, crash_at: str | None) -> int:
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_CRASH_AT", None)
    if crash_at:
        env["SPARK_GRAFT_CRASH_AT"] = crash_at
    proc = subprocess.run(
        [sys.executable, "-c", _PUBLISH_SCRIPT.format(repo=_REPO, lo=lo, hi=hi, path=path)],
        env=env,
        capture_output=True,
        timeout=300,
    )
    return proc.returncode


def _published_ids(spark, path) -> set[int]:
    return {r["id"] for r in read_published(spark, path).collect()}


def test_publish_then_read_roundtrip(spark, tmp_path):
    path = str(tmp_path / "ds")
    publish_parquet_atomic(spark.range(0, 100).selectExpr("id", "id*2 AS v"), path)
    assert _published_ids(spark, path) == set(range(100))
    # second publish atomically replaces
    publish_parquet_atomic(spark.range(100, 150).selectExpr("id", "id*2 AS v"), path)
    assert _published_ids(spark, path) == set(range(100, 150))


@pytest.mark.parametrize(
    "crash_at", ["after_stage", "after_manifest", "before_swap", "after_swap"]
)
def test_crash_leaves_old_or_new_complete_dataset(spark, tmp_path, crash_at):
    """Kill the publisher at every stage. Invariant: the canonical path
    reads as a complete dataset — the old one for crashes before the
    pointer swap, the new one after — and recover_publish + a retry
    always converge to the new dataset."""
    path = str(tmp_path / f"ds_{crash_at}")
    # v1: the "old" dataset, published cleanly
    assert _publish_subprocess(path, 0, 100, crash_at=None) == 0
    old_ids, new_ids = set(range(100)), set(range(100, 250))

    rc = _publish_subprocess(path, 100, 250, crash_at=crash_at)
    assert rc == 137, f"crash hook did not fire at {crash_at}"

    # THE invariant: canonical path still reads complete (old or new)
    got = _published_ids(spark, path)
    if crash_at == "after_swap":
        assert got == new_ids
    else:
        assert got == old_ids

    # recovery is safe and idempotent; a retried publish converges
    recover_publish(path)
    assert _published_ids(spark, path) in (old_ids, new_ids)
    assert _publish_subprocess(path, 100, 250, crash_at=None) == 0
    assert _published_ids(spark, path) == new_ids


def test_torn_stage_is_never_readable_and_gets_collected(spark, tmp_path):
    """A version directory without a valid manifest (torn mid-stage
    write) is garbage: read_published never selects it and
    recover_publish removes it."""
    path = str(tmp_path / "ds")
    publish_parquet_atomic(spark.range(0, 10).selectExpr("id", "id*2 AS v"), path)
    torn = tmp_path / "ds.versions" / "v000999"
    torn.mkdir()
    (torn / "part-00000.parquet").write_bytes(b"\x00 torn bytes")
    assert not manifest_valid(str(torn))
    assert _published_ids(spark, path) == set(range(10))
    recover_publish(path)
    assert not torn.exists()
    assert _published_ids(spark, path) == set(range(10))


def test_manifest_detects_truncated_file(spark, tmp_path):
    """Truncating a committed data file invalidates the manifest —
    read_published refuses rather than returning partial rows."""
    path = str(tmp_path / "ds")
    vdir = publish_parquet_atomic(
        spark.range(0, 10).selectExpr("id", "id*2 AS v"), path
    )
    data_files = [
        f for f in os.listdir(vdir) if f.endswith(".parquet") and not f.startswith(".")
    ]
    full = os.path.join(vdir, data_files[0])
    with open(full, "r+b") as f:
        f.truncate(os.path.getsize(full) - 1)
    assert not manifest_valid(vdir)
    with pytest.raises(FileNotFoundError):
        read_published(spark, path)


# slow tier (VERDICT r10 #2): excluded from the default fast tier;
# run with --full-tests / SPARK_GRAFT_FULL_TESTS=1 (the round-close gate)
pytestmark = pytest.mark.slow

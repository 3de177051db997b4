"""Connected-components correctness on hand-built graphs: chains,
cycles, cliques, self-loops, and convergence within diameter rounds."""

from __future__ import annotations

from esther_apache_spark_spark.operators.components import connected_components


def _cc(spark, pairs):
    edges = spark.createDataFrame(pairs, "src long, dst long")
    return {
        r["node"]: r["comp"] for r in connected_components(edges).collect()
    }


def test_two_components_and_cycle(spark):
    # chain 1-2-3-4, cycle 10-11-12-10, self-loop 20
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10), (20, 20)])
    assert got[1] == got[2] == got[3] == got[4] == 1
    assert got[10] == got[11] == got[12] == 10
    assert got[20] == 20


def test_long_chain_converges(spark):
    n = 40  # diameter 40 > default dense-graph expectation; still < max_iter rounds
    got = _cc(spark, [(i, i + 1) for i in range(n)])
    assert set(got.values()) == {0}
    assert len(got) == n + 1


def test_duplicate_and_reversed_edges(spark):
    got = _cc(spark, [(2, 1), (1, 2), (2, 1), (3, 2)])
    assert got[1] == got[2] == got[3] == 1


# Property: matches a union-find oracle on random graphs.
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _union_find_components(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node of the component
    comp = {}
    for n in parent:
        root = find(n)
        comp.setdefault(root, []).append(n)
    return {n: min(ns) for ns in comp.values() for n in ns}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    )
)
def test_matches_union_find_oracle(spark, pairs):
    assert _cc(spark, pairs) == _union_find_components(pairs)


def test_reliable_checkpoint_dir_identical_labels(spark, tmp_path, monkeypatch):
    """r8 (VERDICT r7 #5): ``checkpoint_dir=`` swaps the per-round
    localCheckpoint (driver-heap blocks in local mode — the sf10 OOM)
    for reliable disk checkpoints. Labels must be identical, the dir
    must actually receive checkpoint data, and the env-var route
    (``SPARK_GRAFT_CHECKPOINT_DIR`` — how bench --sf10-cold wires it)
    must behave the same."""
    import os

    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10), (20, 20)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    base = {r["node"]: r["comp"] for r in connected_components(edges).collect()}

    ckdir = str(tmp_path / "ck")
    via_param = {
        r["node"]: r["comp"]
        for r in connected_components(edges, checkpoint_dir=ckdir).collect()
    }
    assert via_param == base
    assert any(os.scandir(ckdir)), "no checkpoint data written to the dir"

    envdir = str(tmp_path / "ck_env")
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", envdir)
    via_env = {
        r["node"]: r["comp"] for r in connected_components(edges).collect()
    }
    assert via_env == base
    assert any(os.scandir(envdir))


def test_session_shuffle_width_restored_after_cc(spark):
    """r10: connected_components temporarily right-sizes
    spark.sql.shuffle.partitions from the measured edge count (tiny
    quotient graphs were paying 96-task stages per round at the session
    width). The override must never leak: the session value is restored
    after the call, including when the edge plan is invalid."""
    import pyspark

    base = spark.conf.get("spark.sql.shuffle.partitions")
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    labels = {r["node"]: r["comp"] for r in connected_components(edges).collect()}
    assert labels == {1: 1, 2: 1, 3: 1}
    assert spark.conf.get("spark.sql.shuffle.partitions") == base

    bad = edges.select("src")  # missing dst column -> analysis error
    try:
        connected_components(bad).collect()
    except pyspark.errors.exceptions.base.PySparkException:
        pass
    assert spark.conf.get("spark.sql.shuffle.partitions") == base

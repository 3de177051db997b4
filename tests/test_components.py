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


def test_session_shuffle_width_untouched_by_cc(spark):
    """r11 (VERDICT r10 #3): the loop width is scale-derived but applied
    as explicit repartition(n, keys) on the loop frames — the
    session-global spark.sql.shuffle.partitions must never be mutated,
    even transiently, so anything planning concurrently on the same
    session (a streaming trigger, a second CC call) keeps its own
    width. Also covers the invalid-edge-plan path."""
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


def test_cc_concurrent_with_other_query_keeps_width(spark):
    """Two CC loops plus unrelated aggregates planned CONCURRENTLY on
    one session (VERDICT r10 #3): the r10 conf override silently
    narrowed any query planned mid-loop to the quotient-graph width and
    two interleaved CC calls could leave the session narrowed. The r11
    frame-scoped repartition must keep the session conf stable at every
    observation point and both label sets exact."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import functions as F

    base = spark.conf.get("spark.sql.shuffle.partitions")
    e1 = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (10, 11)], "src long, dst long"
    )
    e2 = spark.createDataFrame([(5, 6), (7, 8), (8, 9)], "src long, dst long")
    observed: list[str] = []

    def probe(_):
        # a shuffling aggregate planned while both CC loops run; record
        # the session width it plans against
        spark.range(1000).groupBy((F.col("id") % 7).alias("k")).count().collect()
        observed.append(spark.conf.get("spark.sql.shuffle.partitions"))

    with ThreadPoolExecutor(max_workers=3) as pool:
        f1 = pool.submit(lambda: connected_components(e1).collect())
        f2 = pool.submit(lambda: connected_components(e2).collect())
        probes = [pool.submit(probe, i) for i in range(3)]
        lab1 = {r["node"]: r["comp"] for r in f1.result()}
        lab2 = {r["node"]: r["comp"] for r in f2.result()}
        [p.result() for p in probes]
    assert lab1 == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    assert lab2 == {5: 5, 6: 5, 7: 7, 8: 7, 9: 7}
    assert observed == [base] * len(observed)
    assert spark.conf.get("spark.sql.shuffle.partitions") == base


def test_string_node_ids_converge_exactly(spark):
    """ADVICE r10 (medium): the r10 label-sum convergence check cast
    comp to decimal and returned NULL sums on string ids — every round
    compared None == None and stopped after one iteration, silently
    under-converging long chains. The r11 changed-count check is
    type-agnostic; a 6-hop string chain must fully converge."""
    chain = [(f"doc{i:02d}", f"doc{i + 1:02d}") for i in range(6)]
    edges = spark.createDataFrame(chain, "src string, dst string")
    labels = {r["node"]: r["comp"] for r in connected_components(edges).collect()}
    assert labels == {f"doc{i:02d}": "doc00" for i in range(7)}

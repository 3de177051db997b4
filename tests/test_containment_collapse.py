"""Clone-collapse front end of ``ngram_containment_pairs`` vs direct.

Directional expansion (r8): cross rep pairs replicate to ordered member
pairs with the representative's exact containment; intra pairs within a
nonempty-shingle clone group are 1.0 both directions; document
frequency is member-count-weighted so max_df pruning decisions equal
the direct path's. These fixtures plant the directional cases the
symmetric (Jaccard) machinery never exercises: a short text embedded in
a long one where only ONE direction clears the threshold, deep clone
clusters on both sides of such a pair, and an empty-text clone group.
"""

from __future__ import annotations

import pytest

from esther_apache_spark_spark.operators import dedup as D

QUOTED = "alpha beta gamma delta epsilon zeta"
LONG = (
    "intro words here " + QUOTED + " plus a very long tail "
    + " ".join(f"tail{i}" for i in range(30))
)
OTHER = "completely unrelated text about catalyst optimizer internals"


@pytest.fixture(scope="module")
def cont_docs(spark):
    rows = []
    # 4-deep clone cluster of the SHORT quoted text (ids 1..4)
    rows += [(i, QUOTED) for i in range(1, 5)]
    # 3-deep clone cluster of the LONG carrier (ids 11..13)
    rows += [(i, LONG) for i in range(11, 14)]
    # singleton unrelated text + an empty-text clone pair
    rows += [(21, OTHER), (31, ""), (32, "")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(df) -> dict[tuple[int, int], float]:
    return {
        (int(r["src_id"]), int(r["dst_id"])): float(r["containment"])
        for r in df.collect()
    }


@pytest.mark.parametrize("threshold", [0.8, 0.0])
def test_collapsed_equals_direct(cont_docs, threshold):
    direct = _pairs(
        D.ngram_containment_pairs(
            cont_docs, threshold=threshold, collapse_exact=False
        )
    )
    collapsed = _pairs(
        D.ngram_containment_pairs(
            cont_docs, threshold=threshold, collapse_exact=True
        )
    )
    assert collapsed == direct
    # directional across clone clusters: every short member is fully
    # contained in every long member, never the reverse at 0.8
    for s in range(1, 5):
        for d in range(11, 14):
            assert collapsed[(s, d)] == 1.0
            assert ((d, s) in collapsed) == (threshold == 0.0)
    # intra: ordered both ways inside each clone cluster
    assert collapsed[(1, 2)] == collapsed[(2, 1)] == 1.0
    assert collapsed[(11, 12)] == collapsed[(12, 11)] == 1.0
    # empty-shingle clones never pair
    assert all(31 not in p and 32 not in p for p in collapsed)


def test_member_weighted_pruning_matches_direct(cont_docs):
    # max_df=3: the QUOTED shingles live in 4 clone members + the 3
    # LONG members (df 7 > 3) — pruned in BOTH paths only if df is
    # counted at member level; a distinct-text df (2) would keep them
    direct = _pairs(
        D.ngram_containment_pairs(
            cont_docs, threshold=0.0, max_df=3, collapse_exact=False
        )
    )
    collapsed = _pairs(
        D.ngram_containment_pairs(
            cont_docs, threshold=0.0, max_df=3, collapse_exact=True
        )
    )
    assert collapsed == direct
    # the short->long pairs are gone (their only shared shingles are hot)
    assert (1, 11) not in collapsed

def test_expand_cap_bounds_output_preserving_reachability(cont_docs):
    # ADVICE r8: expand_cap bounds output materialization for deep
    # clones. cap=2 on the 4-deep QUOTED cluster / 3-deep LONG cluster:
    # the emitted pairs must be a subset of the exact set with exact
    # containments, per-member degree bounded, and every clone cluster
    # plus the cross bridge still one connected blob in BOTH directions.
    full = _pairs(
        D.ngram_containment_pairs(cont_docs, threshold=0.0, collapse_exact=True)
    )
    capped = _pairs(
        D.ngram_containment_pairs(
            cont_docs, threshold=0.0, collapse_exact=True, expand_cap=2
        )
    )
    assert set(capped) < set(full)
    assert all(capped[p] == full[p] for p in capped)
    # per-member out-degree bound: chunk clique (<= cap-1) + connectors
    # (<= 2) + cross head-expansion (cap per cross-connected group)
    from collections import defaultdict

    deg = defaultdict(int)
    for s, _d in capped:
        deg[s] += 1
    assert max(deg.values()) <= 2 * (2 + 2)
    # reachability: directed BFS over capped pairs joins each clone
    # cluster; short cluster reaches long cluster (containment bridge)
    adj = defaultdict(set)
    for s, d in capped:
        adj[s].add(d)
    def reach(start):
        seen, stack = set(), [start]
        while stack:
            n = stack.pop()
            if n in seen:
                continue
            seen.add(n)
            stack.extend(adj[n])
        return seen
    assert {1, 2, 3, 4}.issubset(reach(1))
    assert {11, 12, 13}.issubset(reach(11))
    assert {11, 12, 13}.issubset(reach(1))  # via the directional bridge
    # reverse direction inside clusters (bidirectional cliques/connectors)
    radj = defaultdict(set)
    for s, d in capped:
        radj[d].add(s)
    def rreach(start):
        seen, stack = set(), [start]
        while stack:
            n = stack.pop()
            if n in seen:
                continue
            seen.add(n)
            stack.extend(radj[n])
        return seen
    assert {1, 2, 3, 4}.issubset(rreach(4))

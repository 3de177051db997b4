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

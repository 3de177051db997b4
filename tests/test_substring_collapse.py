"""Clone-collapse front end of ``substring_dup_spans`` vs the direct path.

Collapsed (r8): windows/islands run once per DISTINCT text, window
document frequency sums member-count weights, spans replicate to
members. Output must be row-identical to the direct path for both
scopes — these fixtures plant the cases the weighting argument leans
on: a window whose min_doc_freq is met ONLY via clone members, deep
clone clusters, within-doc repeats (scope="any"), texts shorter than
k, and docs whose only duplicated windows come from a partner text.
"""

from __future__ import annotations

import pytest

from esther_apache_spark_spark.operators import dedup as D

SHARED = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
# SHARED embedded in a longer doc: the k=8 window appears in both
CARRIER = SHARED + " iota kappa"
LONER = "one two three four five six seven eight nine ten"  # unique windows
REPEATER = "x y z w v x y z w v x y z w v"  # 5-token period -> k=5 repeats
TINY = "too short"  # < k tokens -> no windows


@pytest.fixture(scope="module")
def span_docs(spark):
    rows = []
    # 5-deep clone cluster of SHARED: cross_doc df = 5 via members alone
    rows += [(i, SHARED) for i in range(1, 6)]
    # one CARRIER doc: its SHARED-window is duplicated via the cluster
    rows += [(11, CARRIER)]
    # clone PAIR of LONER: every window reaches df=2 only through the
    # clone weight — the case a distinct-text df would get wrong
    rows += [(21, LONER), (22, LONER)]
    # single REPEATER doc: within-doc repeats (scope="any" only)
    rows += [(31, REPEATER)]
    # sub-k text, cloned
    rows += [(41, TINY), (42, TINY)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rows(df) -> set[tuple[int, int, int]]:
    return {
        (int(r["doc_id"]), int(r["span_start"]), int(r["span_len"]))
        for r in df.collect()
    }


@pytest.mark.parametrize("scope,k", [("cross_doc", 8), ("any", 5)])
def test_collapsed_equals_direct(span_docs, scope, k):
    direct = _rows(
        D.substring_dup_spans(
            span_docs, k=k, min_doc_freq=2, scope=scope, collapse_exact=False
        )
    )
    collapsed = _rows(
        D.substring_dup_spans(
            span_docs, k=k, min_doc_freq=2, scope=scope, collapse_exact=True
        )
    )
    assert collapsed == direct
    # every clone member carries the representative's spans
    docs_with = {d for d, _, _ in collapsed}
    assert {1, 2, 3, 4, 5} <= docs_with
    assert {41, 42}.isdisjoint(docs_with)


def test_clone_weighted_doc_freq(span_docs):
    # LONER's windows exist in exactly 2 (identical) docs: both clone
    # members must be fully covered at min_doc_freq=2 and absent at 3
    at2 = _rows(
        D.substring_dup_spans(
            span_docs, k=8, min_doc_freq=2, scope="cross_doc", collapse_exact=True
        )
    )
    n_tokens = len(LONER.split())
    assert (21, 0, n_tokens) in at2 and (22, 0, n_tokens) in at2
    at3 = _rows(
        D.substring_dup_spans(
            span_docs, k=8, min_doc_freq=3, scope="cross_doc", collapse_exact=True
        )
    )
    direct3 = _rows(
        D.substring_dup_spans(
            span_docs, k=8, min_doc_freq=3, scope="cross_doc", collapse_exact=False
        )
    )
    assert at3 == direct3
    assert {d for d, _, _ in at3}.isdisjoint({21, 22})


def test_carrier_span_via_clone_cluster(span_docs):
    # CARRIER shares its first 8-token window with the 5-deep cluster:
    # cross_doc df = 6, so the carrier gets exactly the prefix span
    spans = _rows(
        D.substring_dup_spans(
            span_docs, k=8, min_doc_freq=2, scope="cross_doc", collapse_exact=True
        )
    )
    assert (11, 0, 8) in spans


def test_within_doc_repeats_any_scope(span_docs):
    # scope="any": REPEATER's repeated 5-gram windows qualify with a
    # single member (occurrences, not docs) — identical in both paths
    direct = _rows(
        D.substring_dup_spans(
            span_docs, k=5, min_doc_freq=2, scope="any", collapse_exact=False
        )
    )
    collapsed = _rows(
        D.substring_dup_spans(
            span_docs, k=5, min_doc_freq=2, scope="any", collapse_exact=True
        )
    )
    assert collapsed == direct
    assert 31 in {d for d, _, _ in collapsed}

"""Catalog meta-invariants — every registered query is documented,
named consistently, and its oracle (when present) references only the
driver's pre-registered views."""

from __future__ import annotations

import pytest

import re

from esther_apache_spark_spark import plans

DRIVER_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def test_every_query_documented_and_named():
    for name, spec in plans.QUERIES.items():
        assert spec.name == name
        assert spec.doc and len(spec.doc) > 20, f"{name}: missing/thin docstring"


def test_oracles_reference_only_driver_views():
    """The driver registers exactly ten parquet views; an oracle naming
    any other relation would fail only at driver time — catch it here.
    Identifier extraction is rough (FROM/JOIN tokens), which is enough
    to catch a typo'd table name."""
    for name, sql in plans.oracle_sql().items():
        # strip CTE names defined in the statement itself
        ctes = set(
            re.findall(
                r"(?:WITH(?:\s+RECURSIVE)?|,|\))\s*([a-zA-Z_]\w*)\s*(?:\([^)]*\))?"
                r"\s+AS\s*(?:MATERIALIZED\s*)?\(",
                sql,
            )
        )
        refs = re.findall(r"(?:FROM|JOIN)\s+([a-zA-Z_]\w*)", sql)
        for ref in refs:
            ok = (
                ref.lower() in DRIVER_TABLES
                or ref in ctes
                or ref.lower() in {"unnest", "range", "lateral", "generate_series"}
                or ref.lower().startswith("read_")  # duckdb file readers
            )
            assert ok, f"{name}: oracle references unknown relation {ref!r}"


def test_queries_and_oracles_align():
    q = set(plans.queries())
    o = set(plans.oracle_sql())
    assert o <= q, f"oracles without queries: {o - q}"


@pytest.mark.slow  # minutes-long single test; full tier only (VERDICT r10 #2)
def test_catalog_plans_free_of_scale_antipatterns(spark, sf_dir):
    """Sweep EVERY catalog query's physical plan for the three
    100 TB anti-patterns: CartesianProduct, BroadcastNestedLoopJoin and
    row-at-a-time Python (BatchEvalPython). Allowed exceptions are
    pinned by name: four scalar-subquery shapes whose NLJ build side is
    ONE row (global mean / total / avg / doc-count broadcast back), and
    the brute-force similarity oracle whose cartesian is its definition.
    Streaming runner queries are skipped (explaining the returned
    memory-sink table says nothing about the streaming plan; their
    shapes are asserted in the streaming tests)."""
    import contextlib
    import io

    from esther_apache_spark_spark import plans

    ONE_ROW_NLJ_OK = {
        "heavy_hitter_users",        # 1-row global mean
        "q11_important_part_value",  # 1-row global total
        "q22_idle_high_balance_customers",  # 1-row global avg
        "tfidf_top_terms",           # 1-row corpus doc count
        "bm25_top_docs",             # 1-row corpus count + avgdl scalars
        "pagerank_brands",           # 1-row node count broadcast
        "unigram_nll_score_docs",    # 1-row token-total + vocab-size scalars
        "bigram_nll_score_docs",     # same 1-row vocab scalar, bigram model
        "temperature_sample_by_lang",  # 1-row global max-rate scalar
        "similarity_topk_bruteforce",  # fenced all-pairs oracle
        # 1-row sketch aggregate x 1-row exact aggregate combine
        "ams_f2_selfjoin_estimate",
        # 1-row global max-ts horizon broadcast onto the per-user frame
        "survival_km_curve",
        # same horizon scalar, for the two-cohort log-rank companion
        "logrank_churn_by_cohort",
        # 9-row literal decile grid broadcast; the rank-pick equality
        # references both sides so it can't be a hash-join key
        "qte_deciles_by_cohort",
        # 1-row Beta-prior (mu, m) scalar broadcast onto the user frame
        "eb_shrunk_purchase_rate",
        # 1-row (ta, tb) token-total scalar onto the vocabulary frame
        "keyword_keyness_chisq",
        # 1-row exact-join-size aggregate x 1-row sketch-estimate combine
        "cms_join_size_estimate",
        # 1-row MI x 1-row H(lang) x 1-row H(source) scalar combine
        "mi_lang_source_docs",
        # 1-row basket-total scalar onto the bounded brand-pair frame
        "association_rules_brands",
        # 1-row normalization scalars / Rayleigh x trace x n combine over
        # the checkpointed 4096-row scatter frame (model constant)
        "embedding_pca_power_iter",
        # same frames + 1-row deflation scalars (v1'v1, v1'w) per round
        "embedding_pca_top2",
        # 1-row vocab/doc-total scalars onto the vocab-bounded weight
        # table + the bounded per-lang default/prior model frame
        "naive_bayes_langid_docs",
        # 1-row grand-total scalar onto the vocab frame (instead of an
        # empty-partition window, which would single-thread the vocab)
        "js_divergence_corpus_halves",
        # ground-truth side is brute_force_topk's by-contract 5-row
        # broadcast query matrix (same fence as the bruteforce entry)
        "ann_recall_audit",
        # 1-row collapsed centroid array (k structs, model constant)
        # broadcast onto the vectors, once per unrolled Lloyd round
        "kmeans_lloyd_clusters",
        # 1-row (total, k) scalar aggregate joined back onto the
        # |labels|-row count frame
        "class_balance_weights",
        # 1-row global max-orderdate anchor broadcast onto the
        # per-customer RFM frame
        "rfm_customer_segments",
        # 1-row corpus token-total scalar cross-joined onto the
        # min-support-gated bigram frame
        "bigram_lift_top_pairs",
        # 1-row (token-total, vocab-size) scalar onto the vocab-bounded
        # backoff model + the per-doc transition frame
        "bigram_backoff_nll_docs",
        # 1-row day-count scalar onto the calendar-bounded day ranks
        "group_sequential_pocock_ztest",
        # same shared _gs machinery, O'Brien-Fleming boundary
        "group_sequential_obf_ztest",
        # dense candidate list scores the corpus against ONE query
        # vector (brute_force_topk's broadcast query matrix, 1 row by
        # construction) + the BM25 1-row count/avgdl scalars
        "hybrid_search_rrf",
        # greedy MMR over the by-contract top-20 candidate list: the
        # 20×19 sim matrix + per-round ≤5-row selected-set joins
        "mmr_rerank_topk",
        # inequality pair join over the PER-SEGMENT sketch frame — its
        # size is the segment vocabulary (|types|² pairs of few-KB
        # sketches), independent of data volume; the raw keys never
        # enter the join (that is the operator's whole point)
        "audience_overlap_theta",
        # expanding day<=asof pairing over two calendar-bounded page
        # relations (#days × #days·bitmap-pages, KBs at any corpus
        # size) — raw keys/events never enter the join
        "cumulative_distinct_users_daily",
        # same class: 7-day range pairing over the calendar-bounded
        # day × bitmap-page relations
        "sliding_7d_distinct_users",
        # 1-row (n, agree) × 1-row (pe_num) scalar combine
        "langid_kappa_agreement",
    }
    offenders = {}
    for name, spec in plans.QUERIES.items():
        if name.startswith(("streaming_", "stream_")):
            continue
        df = spec.fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        hits = [
            op
            for op in ("CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython")
            if op in plan
        ]
        if hits and not (hits == ["BroadcastNestedLoopJoin"] and name in ONE_ROW_NLJ_OK):
            offenders[name] = hits
    assert not offenders, offenders


def test_bench_headline_names_exist_in_catalog():
    """bench.py's frozen headline set must stay resolvable — a catalog
    rename would otherwise surface only when the driver's bench run
    crashes."""
    import bench

    for name in bench.HEADLINE:
        assert name in plans.QUERIES, f"bench headline {name!r} not in catalog"


def test_doc_counts_match_registry():
    """README's capability header and CATALOG.md's summary line must
    state the real registry counts — stale counts read as either
    padding or missing coverage to a reviewer."""
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    n_q = len(plans.QUERIES)
    n_o = len(plans.oracle_sql())
    readme = (root / "README.md").read_text()
    m = re.search(r"Capability surface \((\d+) catalog queries, (\d+) DuckDB-oracled\)", readme)
    assert m, "README capability header missing"
    assert (int(m.group(1)), int(m.group(2))) == (n_q, n_o), (
        f"README says {m.groups()}, registry has ({n_q}, {n_o})"
    )
    catalog = (root / "CATALOG.md").read_text()
    m2 = re.search(r"\*\*(\d+) queries, (\d+) oracled", catalog)
    assert m2 and (int(m2.group(1)), int(m2.group(2))) == (n_q, n_o), (
        f"CATALOG.md says {m2.groups() if m2 else None}, registry has ({n_q}, {n_o})"
    )

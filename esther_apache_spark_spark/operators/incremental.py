"""Incremental (batch-vs-history) NEAR-duplicate dedup against a
persisted signature index — the daily-ingest shape a 100 TB pipeline
actually runs (VERDICT r8 #1; engine extension — the reference's surface
peaks at batch joins, ``pipeline_pyspark.py:175-184``).

The batch shape everything else in ``operators/dedup.py`` serves is
"dedup the corpus once". A crawl pipeline instead runs: a nightly job
labels the corpus and PERSISTS a signature index; each arriving batch is
then deduplicated against that index WITHOUT re-reading, re-shingling or
re-bucketing a byte of history content, and its pairs are merged into
the existing component labels WITHOUT a global connected-components
recompute — new labels are minima over the AFFECTED components only.

Index formats (plain parquet directories; see ``write_index``):

- MinHash (``build_minhash_bucket_index``): ``bucket_reps`` — one row
  per occupied ``(_band, _bucket)`` per distinct component representative
  in it — plus ``labels`` (node, comp) for history docs with any pair.
  Under the LSH-banding pair criterion, every pair of docs sharing a
  bucket IS a candidate pair, so after history CC each bucket's members
  collapse to (almost always exactly one) component representative —
  the probe side of the index is the BUCKET→COMPONENT map, not the raw
  band rows: an arriving doc landing in a 10⁶-member boilerplate bucket
  creates ONE edge, not 10⁶.
- SRP / embeddings (``build_srp_vector_index``): ``buckets`` (vec id ×
  table × bucket), ``vectors`` (the normalized-content copy the exact
  cosine rerank needs — persisted INTO the index so the merge never
  re-reads the history embedding source), plus ``labels``. Cosine gates
  each candidate, so buckets cannot collapse to reps here; the rerank
  is one cross-GEMM per (table, bucket, shard) cogroup.

Merge (``incremental_minhash_merge`` / ``incremental_srp_merge``):
the arriving batch is banded/bucketed (one narrow pass over BATCH
content only), equi-joined against the index to get batch↔history
edges (history side entering as its component label — the quotient
trick of ``_quotient_labels`` applied across time), self-joined for
batch↔batch edges via the existing pair operators, then ONE
connected-components run over this small graph — nodes are batch ids
plus touched history component labels, never history members. Because
history labels are min-member-ids and CC labels are minima, the merged
labels equal a full-corpus recompute's labels exactly (min of mins);
``tests/test_incremental_dedup.py`` pins that equality, and the catalog
oracles replay the full recompute in SQL.

Scale notes: the index probe join shuffles only the batch's band keys
(history side is a parquet scan of (band, bucket, rep) — at 100 TB,
write it sorted/bucketed by the join key so AQE keeps the exchange on
the batch side); the CC graph is O(new pairs), not O(corpus); the
label remap touches only merged components. Hot-bucket caps from the
batch operators apply to the batch self-join; the index probe is
bounded by the bucket→rep collapse (minhash) / per-candidate rerank
(SRP).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from esther_apache_spark_spark.operators import dedup as D
from esther_apache_spark_spark.operators.components import connected_components

# Single definition of the simulated history/batch split used by every
# incremental catalog entry, its DuckDB oracle, AND the streaming
# novelty gates (ADVICE r9: the gate was duplicated inline in
# streaming/events.py — changing it in one place silently desynced the
# streaming entry from its oracle). hash_bucket(id, salt) < HIST_GATE_FRAC
# selects the 80% "history" slice; >= is the arriving batch.
HIST_GATE_FRAC = int(0.8 * (1 << 32))


# ---------------------------------------------------------------------------
# Index persistence (plain parquet; one subdirectory per table).
# ---------------------------------------------------------------------------


def write_index(index: dict[str, DataFrame], path: str) -> None:
    """Persist an index (dict of named DataFrames) under ``path``, one
    parquet directory per table, overwrite semantics — the nightly
    job's output contract. At 100 TB sort ``bucket_reps``/``buckets``
    by their join key at write time (``sortWithinPartitions``) so the
    probe join's index side scans clustered row groups."""
    for name, df in index.items():
        df.write.mode("overwrite").parquet(f"{path}/{name}")


def read_index(
    spark: SparkSession, path: str, names: list[str]
) -> dict[str, DataFrame]:
    """Re-open a persisted index: {name: DataFrame} for each table."""
    return {n: spark.read.parquet(f"{path}/{n}") for n in names}


def read_index_tables(
    spark: SparkSession, path: str, names: list[str]
) -> dict[str, DataFrame]:
    """Snapshot-aware RAW table read: on a snapshot store
    (``sources/index_store.py``) all ``names`` come from ONE pinned
    manifest version — a concurrent fold/compaction cannot hand a
    reader table A from before it and table B from after; on a plain
    directory index this is ``read_index``. The accessor the
    per-trigger streaming novelty gates use."""
    from esther_apache_spark_spark.sources import index_store as _S

    if _S.has_snapshots(path):
        return _S.read_snapshot(spark, path, names)
    return read_index(spark, path, names)


# ---------------------------------------------------------------------------
# MinHash band index.
# ---------------------------------------------------------------------------


def build_minhash_bucket_index(
    history: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    hash_family: str = "md5",
    max_bucket: int | None = 4096,
    collapse_exact: bool | str = "auto",
    include_doc_bands: bool = True,
) -> dict[str, DataFrame]:
    """The nightly index build: history's component ``labels`` (CC over
    ``minhash_lsh_candidates`` pairs — min-member-id labels) and the
    ``bucket_reps`` map (one row per occupied (band, bucket) per
    distinct component rep occupying it). History content is read ONCE
    here and never again by the merge.

    ``include_doc_bands`` (default on) also emits the PER-DOC band keys
    ``doc_bands (_id, _band, _bucket)`` — the inverse mapping document
    RETIREMENT needs (``retire_minhash_docs``): ``bucket_reps`` merges
    each bucket's members into component reps, so without the per-doc
    rows a takedown could neither re-elect a component's minimum nor
    detect a bridge-doc split without re-reading (possibly already
    TTL'd) corpus content. Cost: ``bands`` narrow rows per doc off the
    already-cached signature frame — the same order as the SRP index's
    ``buckets`` table."""
    pairs = D.minhash_lsh_candidates(
        history,
        id_col=id_col,
        text_col=text_col,
        num_perm=num_perm,
        bands=bands,
        shingle_n=shingle_n,
        max_bucket=max_bucket,
        collapse_exact=collapse_exact,
        hash_family=hash_family,
    )
    labels = connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    sig = D.minhash_band_frame(
        history,
        id_col=id_col,
        text_col=text_col,
        num_perm=num_perm,
        bands=bands,
        shingle_n=shingle_n,
        hash_family=hash_family,
    )
    banded = sig.select("_id", F.posexplode("_bh").alias("_band", "_bucket"))
    bucket_reps = (
        banded.join(labels, banded._id == labels.node, "left")
        .select(
            "_band",
            "_bucket",
            F.coalesce("comp", F.col("_id")).alias("_rep"),
        )
        .distinct()
    )
    out = {"bucket_reps": bucket_reps, "labels": labels}
    if include_doc_bands:
        out["doc_bands"] = banded
    return out


def minhash_merge_edges(
    batch: DataFrame,
    bucket_reps: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    hash_family: str = "md5",
    max_bucket: int | None = 4096,
    collapse_exact: bool | str = "auto",
) -> DataFrame:
    """The merge graph's edge set ``(src, dst)`` — batch↔history-rep
    edges from the index probe join plus batch↔batch edges from the
    ordinary pair operator. Split out from the merge so its lineage
    can be audited (tests pin that it scans the index parquet and the
    BATCH slice only — CC's checkpoints would truncate this plan
    from the final labels frame)."""
    bsig = D.minhash_band_frame(
        batch,
        id_col=id_col,
        text_col=text_col,
        num_perm=num_perm,
        bands=bands,
        shingle_n=shingle_n,
        hash_family=hash_family,
    )
    bband = bsig.select("_id", F.posexplode("_bh").alias("_band", "_bucket"))
    # batch ↔ history-component edges: bucket co-occupancy IS the
    # banding pair criterion, and the index already collapsed each
    # bucket to its component reps
    bh = (
        bband.join(bucket_reps, ["_band", "_bucket"])
        .select(F.col("_id").alias("src"), F.col("_rep").alias("dst"))
        .distinct()
    )
    # batch ↔ batch edges: the ordinary within-corpus pair operator
    bb = D.minhash_lsh_candidates(
        batch,
        id_col=id_col,
        text_col=text_col,
        num_perm=num_perm,
        bands=bands,
        shingle_n=shingle_n,
        max_bucket=max_bucket,
        collapse_exact=collapse_exact,
        hash_family=hash_family,
    ).select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    return bh.unionByName(bb)


def incremental_minhash_merge(
    batch: DataFrame,
    bucket_reps: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    hash_family: str = "md5",
    max_bucket: int | None = 4096,
    collapse_exact: bool | str = "auto",
    checkpoint_dir: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Merge an arriving batch into the persisted MinHash index.
    (The labels table itself is not consulted — ``bucket_reps`` already
    carries each bucket's component reps; labels are only the remap's
    application target.)

    Returns ``(batch_labels, remap)``: ``batch_labels`` is (doc_id,
    comp) for EVERY batch doc — comp equal to what a full-corpus
    recompute would assign (novel docs label themselves); ``remap`` is
    (old_comp, new_comp) for history reps whose label changed — merged
    components (rewrite matching rows in the labels table) and
    previously-unlabeled singletons now joined to a component (insert)
    — what the nightly job applies to the persisted labels.

    Plan shape: one narrow band pass over batch text, one equi-join of
    batch band keys against ``bucket_reps`` (the only touch of
    history — component REPS, never members), the batch self-join via
    ``minhash_lsh_candidates``, then CC over the union graph whose
    node count is O(batch + touched components)."""
    edges = minhash_merge_edges(
        batch,
        bucket_reps,
        id_col=id_col,
        text_col=text_col,
        num_perm=num_perm,
        bands=bands,
        shingle_n=shingle_n,
        hash_family=hash_family,
        max_bucket=max_bucket,
        collapse_exact=collapse_exact,
    )
    merged = connected_components(edges, checkpoint_dir=checkpoint_dir)
    batch_ids = batch.select(F.col(id_col))
    batch_labels = batch_ids.join(
        merged, batch_ids[id_col] == merged.node, "left"
    ).select(
        F.col(id_col),
        F.coalesce("comp", F.col(id_col)).alias("comp"),
    )
    # History-side label moves: every NON-batch node in the merge graph
    # is a history rep — a component label (whose members' labels must
    # be rewritten) or a previously-UNLABELED singleton now joined to a
    # component (whose implicit own-id label gains a real one). In both
    # cases the rep's old label IS the node id, so the remap is simply
    # (node, comp) where they differ; the nightly job applies it to the
    # labels table (rewrite on match, insert for singleton reps).
    remap = (
        merged.join(batch_ids, merged.node == batch_ids[id_col], "left_anti")
        .filter(F.col("comp") != F.col("node"))
        .select(F.col("node").alias("old_comp"), F.col("comp").alias("new_comp"))
    )
    return batch_labels, remap


# ---------------------------------------------------------------------------
# SRP / embedding index.
# ---------------------------------------------------------------------------


def build_srp_vector_index(
    history: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    n_planes: int = 4,
    n_tables: int = 12,
    seed: int = 42,
    dim: int | None = None,
    max_bucket: int | None = 4096,
) -> dict[str, DataFrame]:
    """The nightly embedding-index build: SRP ``buckets`` (id × table ×
    bucket), the ``vectors`` copy the merge's exact rerank reads
    (history's embedding SOURCE is never re-read), and component
    ``labels`` (CC over cosine-gated pairs, the
    ``embedding_cosine_components`` labels)."""
    from esther_apache_spark_spark.operators.similarity import (
        srp_table_buckets_vec,
    )

    if dim is None:
        first = history.select(F.size(vec_col).alias("d")).first()
        if first is None:
            raise ValueError("empty history; pass dim explicitly")
        dim = first["d"]
    labels = D.embedding_cosine_components(
        history,
        id_col=id_col,
        vec_col=vec_col,
        threshold=threshold,
        n_planes=n_planes,
        n_tables=n_tables,
        seed=seed,
        dim=dim,
        max_bucket=max_bucket,
    )
    proj = history.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        srp_table_buckets_vec(
            F.col(vec_col), dim, n_planes, n_tables, seed
        ).alias("_all"),
    )
    buckets = proj.select("_id", F.posexplode("_all").alias("_table", "_bucket"))
    vectors = proj.select("_id", "_v")
    return {"buckets": buckets, "vectors": vectors, "labels": labels}


def srp_batch_history_hits(
    batch: DataFrame,
    buckets: DataFrame,
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    n_planes: int = 4,
    n_tables: int = 12,
    seed: int = 42,
    dim: int | None = None,
    max_bucket: int | None = 4096,
) -> DataFrame:
    """Cosine-gated batch↔history candidate pairs ``(_bid, _hid)``
    against the persisted SRP index — the probe shared by the batch
    merge (``srp_merge_edges``) and the streaming novelty gate
    (``streaming/events.run_stream_srp_novelty``): batch vectors are
    SRP-bucketed, bucket co-occupancy with the index ``buckets``
    nominates candidates, and the index ``vectors`` copy supplies the
    exact rerank (4-dp cosine ≥ ``threshold``) — the history embedding
    SOURCE is never read.

    Rerank shape (r9 sf1 finding): the first cut joined candidate
    PAIRS to both vector tables and folded the cosine as a per-pair
    interpreted expression — 148 s vs the direct path's 19 s at sf1,
    because the direct path GEMMs each bucket. This version cogroups
    batch and history rows per (table, bucket) and reranks as ONE
    numpy cross-GEMM per group (Arrow-batched applyInPandas, float64,
    round-4 — the same kernel contract as ``_srp_rep_pairs``), with
    the batch side chunked inside the kernel so memory stays bounded.
    ``max_bucket`` shards the HISTORY side of hot buckets (batch rows
    replicate to every shard — the pair set is exactly preserved, the
    per-task GEMM is bounded at O(chunk × max_bucket))."""
    import numpy as np
    import pandas as pd

    from esther_apache_spark_spark.operators.similarity import (
        srp_table_buckets_vec,
    )

    if dim is None:
        first = batch.select(F.size(vec_col).alias("d")).first()
        if first is None:
            raise ValueError("empty batch; pass dim explicitly")
        dim = first["d"]
    bproj = D._cache(
        batch.select(
            F.col(id_col).alias("_bid"),
            F.col(vec_col).alias("_bv"),
            srp_table_buckets_vec(
                F.col(vec_col), dim, n_planes, n_tables, seed
            ).alias("_all"),
        )
    )
    bbuck = bproj.select(
        "_bid", "_bv", F.posexplode("_all").alias("_table", "_bucket")
    )
    hbuck = buckets.select(
        F.col("_id").alias("_hid"), "_table", "_bucket"
    ).join(
        vectors.select(F.col("_id").alias("_hid"), F.col("_v").alias("_hv")),
        "_hid",
    )
    if max_bucket is not None:
        # hot-bucket sharding, cross-join flavor: split the HISTORY
        # rows of any (table, bucket) over ceil(n/max_bucket) shards
        # and replicate the batch rows to every shard — same pairs,
        # bounded per-task GEMM, restored parallelism on boilerplate
        # buckets (the self-join analog lives in _srp_rep_pairs)
        hcnt = hbuck.groupBy("_table", "_bucket").agg(
            F.count(F.lit(1)).alias("_hn")
        )
        hot = hcnt.filter(F.col("_hn") > max_bucket).select(
            "_table",
            "_bucket",
            F.ceil(F.col("_hn") / max_bucket).cast("int").alias("_nsh"),
        )
        # no forced broadcast: the hot-bucket list is usually tiny
        # (boilerplate clusters) but grows with corpus in the worst
        # case — AQE broadcasts it while it fits (repo hint doctrine)
        hbuck = hbuck.join(hot, ["_table", "_bucket"], "left").withColumn(
            "_shard",
            F.when(
                F.col("_nsh").isNotNull(),
                F.pmod(F.xxhash64("_hid"), F.col("_nsh")),
            ).otherwise(F.lit(0)),
        ).drop("_nsh")
        bbuck = bbuck.join(hot, ["_table", "_bucket"], "left").withColumn(
            "_shard",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.coalesce(F.col("_nsh"), F.lit(1)) - 1,
                )
            ),
        ).drop("_nsh")
    else:
        hbuck = hbuck.withColumn("_shard", F.lit(0))
        bbuck = bbuck.withColumn("_shard", F.lit(0))

    bside = bbuck.select(
        "_table", "_bucket", "_shard",
        F.col("_bid").alias("_rid"), F.col("_bv").alias("_rv"),
        F.lit("b").alias("_side"),
    )
    hside = hbuck.select(
        "_table", "_bucket", "_shard",
        F.col("_hid").alias("_rid"), F.col("_hv").alias("_rv"),
        F.lit("h").alias("_side"),
    )
    thr = float(threshold)

    def _cross_rerank(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"_bid": [], "_hid": []}).astype(
            {"_bid": "int64", "_hid": "int64"}
        )
        bm = pdf[pdf["_side"] == "b"]
        hm = pdf[pdf["_side"] == "h"]
        if bm.empty or hm.empty:
            return empty
        bids = bm["_rid"].to_numpy()
        hids = hm["_rid"].to_numpy()
        mb = np.array(bm["_rv"].tolist(), dtype="float64")
        mh = np.array(hm["_rv"].tolist(), dtype="float64")
        nb_ = np.linalg.norm(mb, axis=1)
        nh_ = np.linalg.norm(mh, axis=1)
        kb, kh = nb_ > 0, nh_ > 0  # zero-norm: cosine undefined, drop
        bids, mb, nb_ = bids[kb], mb[kb], nb_[kb]
        hids, mh, nh_ = hids[kh], mh[kh], nh_[kh]
        if len(bids) == 0 or len(hids) == 0:
            return empty
        mb = mb / nb_[:, None]
        mh = mh / nh_[:, None]
        out_b, out_h = [], []
        chunk = 1024  # bounds the GEMM block at chunk × |hist shard|
        for lo in range(0, len(bids), chunk):
            s = np.round(mb[lo : lo + chunk] @ mh.T, 4)
            ii, jj = np.nonzero(s >= thr)
            out_b.append(bids[lo : lo + chunk][ii])
            out_h.append(hids[jj])
        return pd.DataFrame(
            {
                "_bid": np.concatenate(out_b) if out_b else [],
                "_hid": np.concatenate(out_h) if out_h else [],
            }
        ).astype({"_bid": "int64", "_hid": "int64"})

    return (
        bside.unionByName(hside)
        .groupBy("_table", "_bucket", "_shard")
        .applyInPandas(_cross_rerank, "_bid long, _hid long")
        .dropDuplicates(["_bid", "_hid"])
    )


def srp_merge_edges(
    batch: DataFrame,
    buckets: DataFrame,
    vectors: DataFrame,
    labels: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    n_planes: int = 4,
    n_tables: int = 12,
    seed: int = 42,
    dim: int | None = None,
    max_bucket: int | None = 4096,
) -> DataFrame:
    """The SRP merge graph's edge set ``(src, dst)`` — cosine-gated
    batch↔history edges from ``srp_batch_history_hits`` (history
    entering as its component label) plus batch↔batch edges. Split out
    so its lineage can be audited: the plan scans the index parquet
    tables and the BATCH slice only (CC's checkpoints would truncate
    this from the final labels frame)."""
    gated = srp_batch_history_hits(
        batch,
        buckets,
        vectors,
        id_col=id_col,
        vec_col=vec_col,
        threshold=threshold,
        n_planes=n_planes,
        n_tables=n_tables,
        seed=seed,
        dim=dim,
        max_bucket=max_bucket,
    )
    bh = (
        gated.join(labels, gated._hid == labels.node, "left")
        .select(
            F.col("_bid").alias("src"),
            F.coalesce("comp", F.col("_hid")).alias("dst"),
        )
        .distinct()
    )
    bb = D.embedding_cosine_dups(
        batch,
        id_col=id_col,
        vec_col=vec_col,
        threshold=threshold,
        n_planes=n_planes,
        n_tables=n_tables,
        seed=seed,
        dim=dim,
        max_bucket=max_bucket,
    ).select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    return bh.unionByName(bb)


def incremental_srp_merge(
    batch: DataFrame,
    buckets: DataFrame,
    vectors: DataFrame,
    labels: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    n_planes: int = 4,
    n_tables: int = 12,
    seed: int = 42,
    dim: int | None = None,
    max_bucket: int | None = 4096,
    checkpoint_dir: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Merge an arriving embedding batch into the persisted SRP index.
    Same contract as ``incremental_minhash_merge``, with the cosine
    gate the minhash path doesn't need: batch↔history candidates
    (bucket co-occupancy against the index ``buckets``) are exactly
    reranked against the index ``vectors`` copy — zero-norm rows
    dropped, cosine rounded to 4 dp, ≥ ``threshold`` — before entering
    the merge graph through the history side's component label."""
    edges = srp_merge_edges(
        batch,
        buckets,
        vectors,
        labels,
        id_col=id_col,
        vec_col=vec_col,
        threshold=threshold,
        n_planes=n_planes,
        n_tables=n_tables,
        seed=seed,
        dim=dim,
        max_bucket=max_bucket,
    )
    merged = connected_components(edges, checkpoint_dir=checkpoint_dir)
    batch_ids = batch.select(F.col(id_col))
    batch_labels = batch_ids.join(
        merged, batch_ids[id_col] == merged.node, "left"
    ).select(
        F.col(id_col),
        F.coalesce("comp", F.col(id_col)).alias("comp"),
    )
    # History-side label moves: every NON-batch node in the merge graph
    # is a history rep — a component label (whose members' labels must
    # be rewritten) or a previously-UNLABELED singleton now joined to a
    # component (whose implicit own-id label gains a real one). In both
    # cases the rep's old label IS the node id, so the remap is simply
    # (node, comp) where they differ; the nightly job applies it to the
    # labels table (rewrite on match, insert for singleton reps).
    remap = (
        merged.join(batch_ids, merged.node == batch_ids[id_col], "left_anti")
        .filter(F.col("comp") != F.col("node"))
        .select(F.col("node").alias("old_comp"), F.col("comp").alias("new_comp"))
    )
    return batch_labels, remap


# ---------------------------------------------------------------------------
# Index maintenance: fold a merge back into the persisted index.
# ---------------------------------------------------------------------------


def _with_rep_self_rows(labels: DataFrame) -> DataFrame:
    """Close a labels frame under representative self-rows: every comp
    value referenced by a member must itself carry (comp, comp) — the
    shape ``connected_components`` emits (the min node of a component
    labels itself). The update paths need this for reps that newly
    GAINED members: a previously-unlabeled history singleton joined by
    a larger-id batch doc, or the min id of an all-novel batch clone
    group — neither appears as a member row or in the remap."""
    comps = labels.select(F.col("comp").alias("node")).distinct()
    self_rows = comps.join(labels, "node", "left_anti").select(
        "node", F.col("node").alias("comp")
    )
    return labels.unionByName(self_rows)


def apply_minhash_merge_to_index(
    bucket_reps: DataFrame,
    labels: DataFrame,
    batch: DataFrame,
    batch_labels: DataFrame,
    remap: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    hash_family: str = "md5",
    doc_bands: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Fold a day's merge back into the MinHash index — the step that
    makes the NIGHTLY job itself incremental: with this, the index is
    never rebuilt from the corpus; it absorbs each batch's bands and
    the merge's label moves, and ``tests/test_incremental_dedup.py``
    pins that the result is byte-identical to ``build_minhash_
    bucket_index`` over the unioned corpus.

    - ``labels``: remap applied to existing rows (old_comp → new_comp,
      which also inserts the previously-singleton reps the remap
      carries), plus the batch's non-self labels. Self-labeled batch
      docs (novel singletons) stay out — matching the fresh build,
      where CC labels only nodes with edges.
    - ``bucket_reps``: existing reps pushed through the remap, plus the
      batch's band keys with each doc's final label, dropping
      duplicates. History content is never touched — the new band rows
      come from the BATCH text (one narrow pass, the same frame the
      merge banded)."""
    rm = remap.select("old_comp", "new_comp")
    new_labels = (
        labels.join(rm, labels.comp == rm.old_comp, "left")
        .select("node", F.coalesce("new_comp", "comp").alias("comp"))
        .unionByName(
            # singleton history reps that gained a component: the remap
            # row IS their label row (old_comp = the node itself)
            rm.join(labels, rm.old_comp == labels.node, "left_anti")
            .select(F.col("old_comp").alias("node"), F.col("new_comp").alias("comp"))
        )
        .unionByName(
            batch_labels.filter(F.col("comp") != F.col(id_col)).select(
                F.col(id_col).alias("node"), "comp"
            )
        )
    )
    new_labels = _with_rep_self_rows(new_labels)
    bsig = D.minhash_band_frame(
        batch,
        id_col=id_col,
        text_col=text_col,
        num_perm=num_perm,
        bands=bands,
        shingle_n=shingle_n,
        hash_family=hash_family,
    )
    bband = bsig.select("_id", F.posexplode("_bh").alias("_band", "_bucket"))
    bl = batch_labels.select(F.col(id_col).alias("_id"), F.col("comp").alias("_rep"))
    new_reps = (
        bucket_reps.join(rm, bucket_reps._rep == rm.old_comp, "left")
        .select("_band", "_bucket", F.coalesce("new_comp", "_rep").alias("_rep"))
        .unionByName(bband.join(bl, "_id").select("_band", "_bucket", "_rep"))
        .distinct()
    )
    out = {"bucket_reps": new_reps, "labels": new_labels}
    if doc_bands is not None:
        # per-doc rows are label-free: the fold is a plain append
        out["doc_bands"] = doc_bands.unionByName(bband)
    return out


def apply_srp_merge_to_index(
    buckets: DataFrame,
    vectors: DataFrame,
    labels: DataFrame,
    batch: DataFrame,
    batch_labels: DataFrame,
    remap: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    n_tables: int = 12,
    seed: int = 42,
    dim: int | None = None,
) -> dict[str, DataFrame]:
    """SRP twin of ``apply_minhash_merge_to_index``: labels absorb the
    remap + batch labels; ``buckets``/``vectors`` are per-doc rows, so
    the update is a plain append of the batch's projections (one
    GEMM pass over BATCH vectors — history vectors untouched)."""
    from esther_apache_spark_spark.operators.similarity import (
        srp_table_buckets_vec,
    )

    if dim is None:
        first = batch.select(F.size(vec_col).alias("d")).first()
        if first is None:
            raise ValueError("empty batch; pass dim explicitly")
        dim = first["d"]
    rm = remap.select("old_comp", "new_comp")
    new_labels = (
        labels.join(rm, labels.comp == rm.old_comp, "left")
        .select("node", F.coalesce("new_comp", "comp").alias("comp"))
        .unionByName(
            rm.join(labels, rm.old_comp == labels.node, "left_anti")
            .select(F.col("old_comp").alias("node"), F.col("new_comp").alias("comp"))
        )
        .unionByName(
            batch_labels.filter(F.col("comp") != F.col(id_col)).select(
                F.col(id_col).alias("node"), "comp"
            )
        )
    )
    new_labels = _with_rep_self_rows(new_labels)
    bproj = batch.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        srp_table_buckets_vec(
            F.col(vec_col), dim, n_planes, n_tables, seed
        ).alias("_all"),
    )
    new_buckets = buckets.unionByName(
        bproj.select("_id", F.posexplode("_all").alias("_table", "_bucket"))
    )
    new_vectors = vectors.unionByName(bproj.select("_id", "_v"))
    return {"buckets": new_buckets, "vectors": new_vectors, "labels": new_labels}


# ---------------------------------------------------------------------------
# Index lifecycle (VERDICT r9 #2): document retirement (tombstones) and
# sub-linear folds (append + remap log + compaction).
#
# The r9 index could only GROW: every fold rewrote the ENTIRE labels /
# bucket_reps tables (at 100 TB the nightly job re-writes the whole
# index daily), and there was no way to retire documents — takedowns
# and TTL'd crawl slices, which a production pipeline hits within its
# first month. Two additions close both:
#
# RETIREMENT (``retire_minhash_docs`` / ``retire_srp_docs``): exact
# deletion is NOT "drop the member rows" — removing a doc can
# (a) orphan a component label (the retired doc WAS the min id: the
#     survivors must re-elect their minimum),
# (b) SPLIT a component (the retired doc was the only bridge between
#     two halves: survivors must re-partition into several components),
# (c) orphan bucket rows (buckets only the retired doc occupied must
#     stop attracting future merge edges).
# All three are resolved by re-running CC over the SURVIVORS OF THE
# AFFECTED COMPONENTS ONLY — sub-linear: retirement never touches a
# component without a retired member, and never re-reads corpus
# content (minhash re-pairs survivors from the index's own per-doc
# ``doc_bands``; SRP re-ranks from the index's ``vectors`` copy).
# Result is pinned equal to a fresh build over the surviving corpus.
#
# SUB-LINEAR FOLDS (``append_*_merge_to_index`` + ``remap_log`` +
# ``compact_index``): the rewrite folds (``apply_*_merge_to_index``)
# stay as the compaction-time semantics; the daily path instead
# APPENDS (new parquet files only — O(batch) rows written): the
# batch's labels/bands/vectors plus the merge's remap appended to a
# ``remap_log`` table. Readers resolve labels through the log's
# transitive closure (``resolve_remap_log`` — CC over the log's
# (old, new) edges; exact because merge labels only ever DECREASE to
# the new component minimum, so the closure's min IS the final label;
# retirement, which can RAISE labels, is a compaction-class operation
# and runs on the resolved view). ``compact_index`` materializes the
# resolved view and truncates the log — the weekly job. The fold-vs-
# rewrite cost split is measured by tools/index_lifecycle_check.py
# (BASELINE.md row).
# ---------------------------------------------------------------------------


def _chain_edges_within(keys_df: DataFrame, id_col: str, part_cols: list[str]) -> DataFrame:
    """Connectivity-preserving linear edge set: within each partition
    (bucket), chain members in id order — (prev, id) per consecutive
    pair. For CC purposes a path is equivalent to the bucket's full
    clique while emitting O(members) edges instead of O(members²), so
    a 10⁶-member boilerplate bucket costs 10⁶ edges, not 10¹². (The
    window sorts each bucket in one task — linear output, and hot
    buckets are bounded upstream by the build's ``max_bucket`` caps.)"""
    from pyspark.sql import Window

    w = Window.partitionBy(*part_cols).orderBy(id_col)
    return (
        keys_df.withColumn("_prev", F.lag(id_col).over(w))
        .filter(F.col("_prev").isNotNull() & (F.col("_prev") != F.col(id_col)))
        .select(F.col("_prev").alias("src"), F.col(id_col).alias("dst"))
    )


def retire_minhash_docs(
    bucket_reps: DataFrame,
    labels: DataFrame,
    doc_bands: DataFrame,
    retired: DataFrame,
    id_col: str = "doc_id",
    checkpoint_dir: str | None = None,
) -> dict[str, DataFrame]:
    """Retire documents from a MinHash index (takedowns / TTL): returns
    the index frames exactly equal to ``build_minhash_bucket_index``
    over the surviving corpus (pinned by tests/test_index_lifecycle.py,
    including min-re-election, bridge-split, whole-component and
    singleton retirement).

    Plan: the AFFECTED components are those with a retired member;
    their surviving members' band keys are pulled from ``doc_bands``
    (corpus content is never read — the takedown may arrive after the
    crawl slice was TTL'd), re-connected via per-bucket chain edges
    (clique-equivalent for CC, linear in bucket size) and re-labeled by
    ONE CC over that subgraph — which re-elects minima and realizes
    splits in the same pass. ``bucket_reps`` drops every row owned by
    an affected component or a retired singleton and regenerates the
    survivors' contribution under their new labels; unaffected rows
    pass through untouched (components never share buckets, so the
    rewrite is proportional to the affected slice, not the index)."""
    rid = retired.select(F.col(id_col).alias("_retid")).distinct()
    aff = (
        labels.join(rid, labels.node == rid._retid, "semi")
        .select("comp")
        .distinct()
    )
    members = labels.join(aff, "comp", "semi")
    surv = members.join(rid, members.node == rid._retid, "left_anti").select(
        "node"
    )
    sb = doc_bands.join(surv, doc_bands._id == surv.node, "semi")
    sub = connected_components(
        _chain_edges_within(sb.select("_id", "_band", "_bucket"), "_id",
                            ["_band", "_bucket"]),
        checkpoint_dir=checkpoint_dir,
    )
    new_labels = labels.join(aff, "comp", "left_anti").unionByName(sub)
    # rows to drop: every row owned by an affected component, plus the
    # retired docs' own-id rows (unlabeled singletons are their own rep
    # and never share a bucket — sharing one would make them a pair)
    drop = aff.select(F.col("comp").alias("_rep")).unionByName(
        rid.select(F.col("_retid").alias("_rep"))
    )
    kept = bucket_reps.join(drop, "_rep", "left_anti")
    surv_bands = doc_bands.join(surv, doc_bands._id == surv.node, "semi")
    regen = (
        surv_bands.join(sub, surv_bands._id == sub.node, "left")
        .select(
            "_band", "_bucket", F.coalesce("comp", F.col("_id")).alias("_rep")
        )
        .distinct()
    )
    new_doc_bands = doc_bands.join(
        rid, doc_bands._id == rid._retid, "left_anti"
    )
    return {
        "bucket_reps": kept.unionByName(regen),
        "labels": new_labels,
        "doc_bands": new_doc_bands,
    }


def retire_srp_docs(
    buckets: DataFrame,
    vectors: DataFrame,
    labels: DataFrame,
    retired: DataFrame,
    id_col: str = "vec_id",
    threshold: float = 0.4,
    n_planes: int = 4,
    n_tables: int = 12,
    seed: int = 42,
    dim: int | None = None,
    max_bucket: int | None = 4096,
    checkpoint_dir: str | None = None,
) -> dict[str, DataFrame]:
    """SRP twin of ``retire_minhash_docs``. ``buckets``/``vectors`` are
    per-doc tables, so their retirement is a plain anti-join; labels of
    AFFECTED components are re-derived by re-ranking the surviving
    members' vectors — read from the index's own ``vectors`` copy, the
    embedding source is never touched — through the SAME pair operator
    the fresh build uses (``embedding_cosine_dups``: seeded SRP
    buckets, exact 4-dp cosine gate, hot-bucket sharding), then one CC
    over those pairs. Cosine edges are not transitive, so the minhash
    path's chain shortcut does not apply here; the pair operator's
    ``max_bucket`` caps bound the rerank instead."""
    rid = retired.select(F.col(id_col).alias("_retid")).distinct()
    aff = (
        labels.join(rid, labels.node == rid._retid, "semi")
        .select("comp")
        .distinct()
    )
    members = labels.join(aff, "comp", "semi")
    surv = members.join(rid, members.node == rid._retid, "left_anti").select(
        "node"
    )
    surv_vecs = vectors.join(surv, vectors._id == surv.node, "semi").select(
        F.col("_id").alias(id_col), F.col("_v").alias("embedding")
    )
    pairs = D.embedding_cosine_dups(
        surv_vecs,
        id_col=id_col,
        vec_col="embedding",
        threshold=threshold,
        n_planes=n_planes,
        n_tables=n_tables,
        seed=seed,
        dim=dim,
        max_bucket=max_bucket,
    ).select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    sub = connected_components(pairs, checkpoint_dir=checkpoint_dir)
    new_labels = labels.join(aff, "comp", "left_anti").unionByName(sub)
    return {
        "buckets": buckets.join(rid, buckets._id == rid._retid, "left_anti"),
        "vectors": vectors.join(rid, vectors._id == rid._retid, "left_anti"),
        "labels": new_labels,
    }


# ---------------------------------------------------------------------------
# Sub-linear folds: append + remap log + compaction.
# ---------------------------------------------------------------------------


def append_index(index: dict[str, DataFrame], path: str) -> None:
    """Append rows to an index's tables (new parquet files only — no
    existing file is rewritten). The daily-fold write primitive."""
    for name, df in index.items():
        df.write.mode("append").parquet(f"{path}/{name}")


def append_minhash_merge_to_index(
    path: str,
    batch: DataFrame,
    batch_labels: DataFrame,
    remap: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    hash_family: str = "md5",
) -> None:
    """The SUB-LINEAR nightly fold (VERDICT r9 #2b): where
    ``apply_minhash_merge_to_index`` rebuilds the full labels /
    bucket_reps frames (the nightly job rewrites the ENTIRE index
    daily — linear in corpus age), this appends O(batch) rows and the
    merge's remap to a ``remap_log``; readers resolve stale labels
    through the log's closure (``read_minhash_index_resolved``), and
    ``compact_index`` materializes + truncates weekly.

    Appended: batch band keys under their final labels (bucket_reps),
    the per-doc band rows (doc_bands), the batch's non-self labels
    PLUS the remap rows as label rows — (old_comp → new_comp) is
    exactly the label row a previously-singleton rep gains, and for
    already-labeled reps it duplicates what log resolution computes
    (the resolved read's distinct folds it) — and the remap itself
    (remap_log). Correctness precondition, pinned by test: merges must
    run against the RESOLVED view, so each remap's old_comp is a
    CURRENT label and the log stays a forest of strictly-decreasing
    chains whose closure-min is the final label."""
    append_index(
        _minhash_fold_delta(
            batch,
            batch_labels,
            remap,
            id_col=id_col,
            text_col=text_col,
            num_perm=num_perm,
            bands=bands,
            shingle_n=shingle_n,
            hash_family=hash_family,
        ),
        path,
    )


def _minhash_fold_delta(
    batch: DataFrame,
    batch_labels: DataFrame,
    remap: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    hash_family: str = "md5",
) -> dict[str, DataFrame]:
    """The per-table row delta ONE MinHash fold contributes — shared by
    the plain-directory append fold above and the snapshot commit fold
    (``commit_minhash_fold``)."""
    bsig = D.minhash_band_frame(
        batch,
        id_col=id_col,
        text_col=text_col,
        num_perm=num_perm,
        bands=bands,
        shingle_n=shingle_n,
        hash_family=hash_family,
    )
    bband = bsig.select("_id", F.posexplode("_bh").alias("_band", "_bucket"))
    bl = batch_labels.select(
        F.col(id_col).alias("_id"), F.col("comp").alias("_rep")
    )
    rm = remap.select("old_comp", "new_comp")
    return {
        "bucket_reps": bband.join(bl, "_id")
        .select("_band", "_bucket", "_rep")
        .distinct(),
        "doc_bands": bband,
        "labels": batch_labels.filter(F.col("comp") != F.col(id_col))
        .select(F.col(id_col).alias("node"), "comp")
        .unionByName(
            rm.select(
                F.col("old_comp").alias("node"),
                F.col("new_comp").alias("comp"),
            )
        ),
        "remap_log": rm,
    }


def append_srp_merge_to_index(
    path: str,
    batch: DataFrame,
    batch_labels: DataFrame,
    remap: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    n_tables: int = 12,
    seed: int = 42,
    dim: int | None = None,
) -> None:
    """SRP twin of ``append_minhash_merge_to_index``: ``buckets`` /
    ``vectors`` are per-doc tables, so their deltas are plain appends
    of the batch's projections; labels and the remap follow the same
    log discipline as the minhash fold."""
    append_index(
        _srp_fold_delta(
            batch,
            batch_labels,
            remap,
            id_col=id_col,
            vec_col=vec_col,
            n_planes=n_planes,
            n_tables=n_tables,
            seed=seed,
            dim=dim,
        ),
        path,
    )


def _srp_fold_delta(
    batch: DataFrame,
    batch_labels: DataFrame,
    remap: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    n_tables: int = 12,
    seed: int = 42,
    dim: int | None = None,
) -> dict[str, DataFrame]:
    """The per-table row delta ONE SRP fold contributes — shared by the
    plain-directory append fold above and ``commit_srp_fold``."""
    from esther_apache_spark_spark.operators.similarity import (
        srp_table_buckets_vec,
    )

    if dim is None:
        first = batch.select(F.size(vec_col).alias("d")).first()
        if first is None:
            raise ValueError("empty batch; pass dim explicitly")
        dim = first["d"]
    bproj = batch.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        srp_table_buckets_vec(
            F.col(vec_col), dim, n_planes, n_tables, seed
        ).alias("_all"),
    )
    rm = remap.select("old_comp", "new_comp")
    return {
        "buckets": bproj.select(
            "_id", F.posexplode("_all").alias("_table", "_bucket")
        ),
        "vectors": bproj.select("_id", "_v"),
        "labels": batch_labels.filter(F.col("comp") != F.col(id_col))
        .select(F.col(id_col).alias("node"), "comp")
        .unionByName(
            rm.select(
                F.col("old_comp").alias("node"),
                F.col("new_comp").alias("comp"),
            )
        ),
        "remap_log": rm,
    }


def resolve_remap_log(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame | None:
    """Transitive closure of the appended remap log as a resolution map
    ``(node=any logged comp value, comp=its final label)`` — CC over
    the log's (old, new) edges. Exact because merge-remaps only ever
    LOWER a label to the new component minimum: the log is a forest of
    decreasing chains/trees whose connected minimum IS the final label
    (retirement can raise labels, which is why it is compaction-class
    and never enters the log). The log is O(components touched per
    fold) — tiny next to the index — so this closure is cheap and its
    application to the base tables is a broadcast-size join.

    On a snapshot store (``sources/index_store.py``) the log is read
    from the pinned manifest ``version`` so it is consistent with the
    base tables read at the same version."""
    import os as _os

    from esther_apache_spark_spark.sources import index_store as _S

    if _S.has_snapshots(path):
        m = _S.read_manifest(path, version)
        if "remap_log" not in m["tables"]:
            return None
        log = _S.read_snapshot(spark, path, ["remap_log"], m["version"])[
            "remap_log"
        ]
    else:
        log_dir = f"{path}/remap_log"
        if not _os.path.isdir(log_dir):
            return None
        log = spark.read.parquet(log_dir)
    return connected_components(
        log.select(
            F.col("old_comp").alias("src"), F.col("new_comp").alias("dst")
        )
    )


def _resolve_col(
    df: DataFrame, col: str, res: DataFrame | None
) -> DataFrame:
    """Rewrite ``col`` through a resolution map (left join + coalesce);
    identity when the index has no log."""
    if res is None:
        return df
    rl = res.select(F.col("node").alias("_rold"), F.col("comp").alias("_rnew"))
    others = [c for c in df.columns if c != col]
    return (
        df.join(rl, df[col] == rl._rold, "left")
        .select(*others, F.coalesce("_rnew", col).alias(col))
        .select(*df.columns)
    )


def read_minhash_index_resolved(
    spark: SparkSession, path: str, version: int | None = None
) -> dict[str, DataFrame]:
    """Open an append-mode MinHash index as the resolved view the
    rewrite fold would have produced: labels and bucket reps pushed
    through the remap-log closure, duplicates folded, label frame
    closed under rep self-rows. Equal (pinned) to
    ``apply_minhash_merge_to_index`` run fold-by-fold, and therefore
    to a fresh build over the accumulated corpus.

    On a snapshot store, ALL tables (including the remap log) are read
    from one pinned manifest version (latest by default), so concurrent
    folds/compactions cannot tear the view; ``version`` time-travels."""
    import os as _os

    from esther_apache_spark_spark.sources import index_store as _S

    if _S.has_snapshots(path):
        m = _S.read_manifest(path, version)
        version = m["version"]
        names = [
            n
            for n in ("bucket_reps", "labels", "doc_bands")
            if n in m["tables"]
        ]
        raw = _S.read_snapshot(spark, path, names, version)
        res = resolve_remap_log(spark, path, version)
    else:
        names = ["bucket_reps", "labels"]
        if _os.path.isdir(f"{path}/doc_bands"):
            names.append("doc_bands")
        raw = read_index(spark, path, names)
        res = resolve_remap_log(spark, path)
    labels = _with_rep_self_rows(
        _resolve_col(raw["labels"], "comp", res).distinct()
    )
    reps = _resolve_col(raw["bucket_reps"], "_rep", res).distinct()
    out = {"bucket_reps": reps, "labels": labels}
    if "doc_bands" in raw:
        out["doc_bands"] = raw["doc_bands"]
    return out


def read_srp_index_resolved(
    spark: SparkSession, path: str, version: int | None = None
) -> dict[str, DataFrame]:
    """SRP twin of ``read_minhash_index_resolved`` (buckets/vectors are
    per-doc appends and pass through raw)."""
    from esther_apache_spark_spark.sources import index_store as _S

    if _S.has_snapshots(path):
        m = _S.read_manifest(path, version)
        version = m["version"]
        raw = _S.read_snapshot(
            spark, path, ["buckets", "vectors", "labels"], version
        )
        res = resolve_remap_log(spark, path, version)
    else:
        raw = read_index(spark, path, ["buckets", "vectors", "labels"])
        res = resolve_remap_log(spark, path)
    labels = _with_rep_self_rows(
        _resolve_col(raw["labels"], "comp", res).distinct()
    )
    return {
        "buckets": raw["buckets"],
        "vectors": raw["vectors"],
        "labels": labels,
    }


def compact_index(spark: SparkSession, path: str, kind: str) -> None:
    """The weekly compaction: materialize the resolved view into fresh
    base tables and truncate the remap log, bounding resolved-read cost
    between compactions. ``kind`` is ``"minhash"`` or ``"srp"``.

    Plain-directory store: the resolved frames are written to a sibling
    scratch dir FIRST (the write is the action that reads the old
    files), then swapped in — single-writer only; a concurrent reader
    can catch the swap window. Snapshot store: the resolved view is
    published as one replace-commit — concurrent readers keep whatever
    version they pinned, the log truncates to an empty table in the
    same commit, and old files survive until ``vacuum_snapshots``."""
    import os as _os
    import shutil as _shutil

    from esther_apache_spark_spark.sources import index_store as _S

    snap = _S.has_snapshots(path)
    version = _S.latest_version(path) if snap else None
    if kind == "minhash":
        resolved = read_minhash_index_resolved(spark, path, version)
    elif kind == "srp":
        resolved = read_srp_index_resolved(spark, path, version)
    else:
        raise ValueError(f"unknown index kind: {kind!r}")
    if snap:
        resolved = _with_truncated_log(spark, path, version, resolved)
        # expected_base: the resolved frames were computed at `version`;
        # a commit landing in between must fail the publish
        # (ConcurrentReplaceError) rather than be silently erased.
        # bump_epoch=False: compaction preserves the logical view, so a
        # concurrent fold's delta stays valid and may re-merge.
        _S.commit_snapshot(
            path, resolved, mode="replace", expected_base=version,
            bump_epoch=False,
        )
        return
    tmp = f"{path}.compacting"
    _shutil.rmtree(tmp, ignore_errors=True)
    write_index(resolved, tmp)
    for name in resolved:
        _shutil.rmtree(f"{path}/{name}", ignore_errors=True)
        _os.rename(f"{tmp}/{name}", f"{path}/{name}")
    _shutil.rmtree(f"{path}/remap_log", ignore_errors=True)
    _shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# Snapshot-isolated index commits (sources/index_store.py): the shared-
# index deployment, where the nightly fold WRITES while streaming
# novelty gates and ad-hoc merges READ the same path. Directory
# append/overwrite tears under that concurrency; these wrappers publish
# every lifecycle step as an atomic manifest commit instead. The frames
# produced are identical to the directory API's (pinned by
# tests/test_index_snapshots.py) — only the storage protocol differs.
# ---------------------------------------------------------------------------


def _with_truncated_log(
    spark: SparkSession, path: str, version: int, frames: dict
) -> dict:
    """Attach an EMPTY remap_log to a replace-commit's frames when the
    snapshot at ``version`` carries one: retirement and compaction both
    publish fully-resolved labels, so any surviving log rows would
    re-lower them wrongly at read."""
    from esther_apache_spark_spark.sources import index_store as _S

    m = _S.read_manifest(path, version)
    if "remap_log" not in m["tables"]:
        return frames
    log = _S.read_snapshot(spark, path, ["remap_log"], version)["remap_log"]
    return {**frames, "remap_log": log.limit(0)}


def commit_index(
    index: dict[str, DataFrame], path: str, mode: str = "replace"
) -> int:
    """Publish an index (e.g. a fresh ``build_*_index`` output) as one
    atomic snapshot commit; returns the published version. A replace
    over an EXISTING store is compare-and-swapped against the current
    latest version (a commit racing in between raises
    ``ConcurrentReplaceError`` — rebuilds derive from the corpus, so
    the caller decides whether the race matters and re-publishes)."""
    from esther_apache_spark_spark.sources import index_store as _S

    expected = (
        _S.latest_version(path) if mode == "replace" else None
    )
    return _S.commit_snapshot(
        path, index, mode=mode, expected_base=expected
    )


def commit_minhash_fold(
    path: str,
    batch: DataFrame,
    batch_labels: DataFrame,
    remap: DataFrame,
    expected_epoch: int | None = None,
    **kw,
) -> int:
    """Snapshot twin of ``append_minhash_merge_to_index``: the same
    O(batch) fold delta, published as ONE append-commit — a reader
    never sees the fold's ``bucket_reps`` without its ``remap_log``.

    Pass ``expected_epoch`` (the manifest ``epoch`` captured when the
    resolved view the merge ran against was read): a retirement landing
    between derivation and commit then raises ``StaleAppendError``
    instead of silently re-merging labels that may reference retired
    documents."""
    from esther_apache_spark_spark.sources import index_store as _S

    return _S.commit_snapshot(
        path,
        _minhash_fold_delta(batch, batch_labels, remap, **kw),
        mode="append",
        expected_epoch=expected_epoch,
    )


def commit_srp_fold(
    path: str,
    batch: DataFrame,
    batch_labels: DataFrame,
    remap: DataFrame,
    expected_epoch: int | None = None,
    **kw,
) -> int:
    """Snapshot twin of ``append_srp_merge_to_index``; see
    ``commit_minhash_fold`` for the ``expected_epoch`` contract."""
    from esther_apache_spark_spark.sources import index_store as _S

    return _S.commit_snapshot(
        path,
        _srp_fold_delta(batch, batch_labels, remap, **kw),
        mode="append",
        expected_epoch=expected_epoch,
    )


def retire_minhash_index(
    spark: SparkSession,
    path: str,
    retired: DataFrame,
    id_col: str = "doc_id",
    checkpoint_dir: str | None = None,
) -> int:
    """Retire documents from a snapshot-store MinHash index: read the
    resolved view at one pinned version, prune it with
    ``retire_minhash_docs``, and publish the pruned index as a
    replace-commit. Retirement re-elects labels (it can RAISE them), so
    the remap log — whose closure assumes labels only ever decrease —
    is truncated in the same commit; the pruned tables it publishes are
    already fully resolved."""
    from esther_apache_spark_spark.sources import index_store as _S

    version = _S.latest_version(path)
    resolved = read_minhash_index_resolved(spark, path, version)
    if "doc_bands" not in resolved:
        raise ValueError(
            "retirement needs the per-doc band table: this index was "
            "built without doc_bands (build_minhash_bucket_index("
            "include_doc_bands=False)) — rebuild with the default "
            "include_doc_bands=True to enable takedowns"
        )
    pruned = retire_minhash_docs(
        resolved["bucket_reps"],
        resolved["labels"],
        resolved["doc_bands"],
        retired,
        id_col=id_col,
        checkpoint_dir=checkpoint_dir,
    )
    pruned = _with_truncated_log(spark, path, version, pruned)
    return _S.commit_snapshot(
        path, pruned, mode="replace", expected_base=version
    )


def retire_srp_index(
    spark: SparkSession,
    path: str,
    retired: DataFrame,
    id_col: str = "vec_id",
    checkpoint_dir: str | None = None,
    **retire_kw,
) -> int:
    """SRP twin of ``retire_minhash_index``."""
    from esther_apache_spark_spark.sources import index_store as _S

    version = _S.latest_version(path)
    resolved = read_srp_index_resolved(spark, path, version)
    pruned = retire_srp_docs(
        resolved["buckets"],
        resolved["vectors"],
        resolved["labels"],
        retired,
        id_col=id_col,
        checkpoint_dir=checkpoint_dir,
        **retire_kw,
    )
    pruned = _with_truncated_log(spark, path, version, pruned)
    return _S.commit_snapshot(
        path, pruned, mode="replace", expected_base=version
    )

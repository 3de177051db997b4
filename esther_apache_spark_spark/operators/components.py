"""Connected components — iterative min-label propagation on DataFrames
(engine extension; the canonicalization step a dedup pipeline runs after
candidate generation: near-dup PAIRS become duplicate CLUSTERS, and each
cluster keeps one canonical document).

No GraphX/GraphFrames dependency: labels live in a (node, comp) frame;
each round every node takes the min of its own label and its neighbors'
labels (messages flow both edge directions); convergence when no label
changes. Rounds needed = graph diameter, so LSH-style dup graphs (small,
dense clusters) converge in 2-4 rounds.

Scale notes:
- Each round is one shuffle join (edges ⋈ labels) + one min-aggregate —
  both keyed on node id, co-partitionable.
- A checkpoint after every round truncates the lineage; without it the
  plan doubles per iteration and the driver, not the data, becomes the
  bottleneck. The DEFAULT is ``localCheckpoint`` (block-manager memory
  — fast, no disk round-trip), but on local[k] the block manager IS
  the driver heap, and the r7 sf10 checkpoint OOMed an 8 GB heap on
  the survivor family's edge frames. ``checkpoint_dir=`` (or the
  ``SPARK_GRAFT_CHECKPOINT_DIR`` env var — how ``bench.py
  --sf10-cold`` wires it) switches every round to RELIABLE
  ``checkpoint(eager=True)`` into that directory: lineage truncates
  the same way, blocks live on disk instead of heap, and on a real
  cluster the dir is shared storage (HDFS/S3) so executor loss is
  also survivable mid-iteration.
- The convergence check is a count of changed labels — one tiny action
  per round, the canonical Pregel-style stop condition.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(node, comp) for every node appearing in ``edges``; ``comp`` is
    the minimum node id of the node's connected component. Edges are
    treated as undirected; self-loops and duplicate edges are fine.

    ``checkpoint_dir`` (default: the ``SPARK_GRAFT_CHECKPOINT_DIR``
    env var, else None) selects reliable disk checkpoints over
    ``localCheckpoint`` for the per-round lineage truncation — see the
    module docstring for when each wins. Results are identical either
    way; only where the materialized blocks live changes."""
    if checkpoint_dir is None:
        checkpoint_dir = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR") or None
    if checkpoint_dir:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

        def _ckpt(df: DataFrame) -> DataFrame:
            return df.checkpoint(eager=True)

    else:

        def _ckpt(df: DataFrame) -> DataFrame:
            return df.localCheckpoint()

    # Scale-adaptive shuffle width for the iteration (r10, guide §2):
    # every round's joins/aggregates inherit the SESSION shuffle
    # partition count, which is sized for full-corpus scans — on the
    # quotient graphs the loop actually iterates over (thousands of
    # rows) that meant 32-task reduce stages and 64-96-task map stages
    # per sub-job, ~4,300 tasks per survivor query, almost all
    # scheduling overhead (AQE's read-side coalescing cannot shrink the
    # map side). The loop re-derives the width from the MEASURED edge
    # count (~64k edge rows per task, capped at the session setting, so
    # a 100 TB edge frame keeps the full session width) and restores the
    # session value afterwards. Measured on the real semantic survivor
    # graph: 7.0 s → 3.7 s, 4,268 → 740 tasks, identical labels.
    _sess = edges.sparkSession
    _SP = "spark.sql.shuffle.partitions"
    _sp_old = _sess.conf.get(_SP)
    try:
        return _cc_loop(edges, src, dst, max_iter, _ckpt, _sess, _SP, _sp_old)
    finally:
        _sess.conf.set(_SP, _sp_old)


def _cc_loop(edges, src, dst, max_iter, _ckpt, _sess, _SP, _sp_old):
    # Materialize the (possibly expensive) edge plan ONCE before the
    # direction-doubling union (r10): without this, both union branches
    # embed the full upstream pipeline — the survivor queries' whole
    # candidate-generation subtree was planned and partially re-executed
    # twice (ReuseExchange dedupes identical exchanges but not broadcast
    # builds or scan-side compute), and the analyzer paid for a 2× plan.
    ed = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).persist()
    und = _ckpt(
        ed.union(ed.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
    )
    ed.unpersist()
    # Width ∝ measured edge count (see wrapper comment): the union above
    # ran at the session width (size unknown before materialization);
    # everything from the label seed on runs right-sized.
    n_und = und.count()
    try:
        _cap = max(1, int(_sp_old))
    except (TypeError, ValueError):
        _cap = 200
    _sess.conf.set(_SP, str(max(1, min(_cap, (n_und + 65535) // 65536))))
    # Seed labels with the FIRST neighbor-min round fused into the node
    # scan (r10): comp₀(v) = min(v, min neighbors) is exactly what the
    # old identity-seeded loop computed in its first propagation, for
    # the price of the distinct-node aggregate the seed paid anyway —
    # one round's joins removed outright.
    labels = _ckpt(
        und.groupBy("a")
        .agg(F.min("b").alias("_mb"))
        .select(F.col("a").alias("node"), F.least("a", "_mb").alias("comp"))
    )
    # Convergence by label-sum (r10): labels only ever DECREASE pointwise
    # over a fixed node set, so Σcomp is strictly decreasing until the
    # fixpoint — one scan-aggregate over the just-checkpointed frame
    # replaces the old per-round join-and-count job. DECIMAL(38,0) keeps
    # the sum exact for any node count / 63-bit ids.
    _sum = lambda df: df.agg(  # noqa: E731
        F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")
    ).first()["s"]
    prev_sum = _sum(labels)
    for _ in range(max_iter):
        msgs = und.join(labels, und.a == labels.node).select(
            F.col("b").alias("node"), "comp", F.lit(None).cast("long").alias("old")
        )
        # Cache (lazily) instead of an eager checkpoint: the round's ONE
        # materializing job is the new_labels checkpoint below; every
        # reuse of prop/step reads the cache (and identical exchange
        # subtrees are deduplicated by ReuseExchange). One aggregate
        # yields both the neighbor-min comp AND the node's previous
        # label (min over the single tagged labels row).
        prop = (
            msgs.union(
                labels.select("node", "comp", F.col("comp").alias("old"))
            )
            .groupBy("node")
            .agg(F.min("comp").alias("comp"), F.min("old").alias("old"))
        ).persist()
        # HOOK (Shiloach–Vishkin, r10): each node reports its improved
        # minimum back to its PREVIOUS label ("parent"), so the round's
        # best minimum re-attaches at the top of every label tree instead
        # of crawling outward one neighbor hop per round. On the real
        # semantic survivor graph at sf0.1 this alone cut 9 rounds to 4
        # (measured by replaying the exact rep-pair edge set); pure
        # pointer jumping cut nothing there because the min-label
        # wavefront, not pointer-chain depth, was the binding distance.
        hooks = prop.groupBy(F.col("old").alias("node")).agg(
            F.min("comp").alias("_hc")
        )
        hooked = (
            prop.join(hooks, "node", "left")
            .select(
                "node",
                F.least("comp", F.coalesce("_hc", "comp")).alias("comp"),
            )
        ).persist()
        # Pointer jumping: comp ← comp(comp(node)), applied TWICE per
        # round. Chains/trees converge in O(log₄) rounds; comp is always
        # a node id present in the label frame, so the self-joins always
        # match.
        jump = hooked.select(F.col("node").alias("_jn"), F.col("comp").alias("_jc"))
        step = (
            hooked.join(jump, hooked.comp == jump._jn)
            .select(hooked.node, F.least(hooked.comp, jump._jc).alias("comp"))
        ).persist()
        jump2 = step.select(F.col("node").alias("_jn"), F.col("comp").alias("_jc"))
        new_labels = _ckpt(
            step.join(jump2, step.comp == jump2._jn)
            .select(step.node, F.least(step.comp, jump2._jc).alias("comp"))
        )
        prop.unpersist()
        hooked.unpersist()
        step.unpersist()
        labels = new_labels
        new_sum = _sum(labels)
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels

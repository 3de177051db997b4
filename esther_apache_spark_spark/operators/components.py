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
- The convergence check rides the round's checkpoint job as an
  ``observe`` metric (count of labels the round changed — the canonical
  Pregel-style stop condition): ONE action per round, no separate
  convergence job (r11; the r10 label-sum scan cost ~80 ms × rounds ×
  every CC consumer, and its DECIMAL cast silently broke on non-numeric
  node ids — the changed-count comparison is type-agnostic).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Observation
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
    Node ids may be any orderable type (longs, strings, ...).

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

    return _cc_loop(edges, src, dst, max_iter, _ckpt)


def _loop_width(n_edges: int, session) -> int:
    """Scale-adaptive shuffle width for the iteration (r10, guide §2):
    the loop's joins/aggregates would otherwise inherit the SESSION
    shuffle partition count, which is sized for full-corpus scans — on
    the quotient graphs the loop actually iterates over (thousands of
    rows) that meant 32-task reduce stages and 64-96-task map stages
    per sub-job, ~4,300 tasks per survivor query, almost all scheduling
    overhead (AQE cannot re-optimize the checkpoint executions the loop
    is made of). Width = ~64k undirected-edge rows per task (2× the
    measured directed count bounds |und|), CAPPED at the session
    setting, so a 100 TB edge frame keeps the full session width — the
    derivation only ever narrows tiny iteration graphs. Applied as
    explicit ``repartition(n, keys)`` on the loop frames (r11) rather
    than a session-conf override: same exchanges, same task counts,
    but nothing session-global mutates — a streaming trigger or second
    CC call planning concurrently on the same session keeps its own
    width."""
    try:
        cap = max(1, int(session.conf.get("spark.sql.shuffle.partitions")))
    except (TypeError, ValueError):
        cap = 200
    return max(1, min(cap, (2 * n_edges + 65535) // 65536))


def _cc_loop(edges, src, dst, max_iter, _ckpt):
    # Materialize the (possibly expensive) edge plan ONCE — with an
    # EAGER action — before the direction-doubling union (r11). The r10
    # persist() alone was lazy: the union-distinct checkpoint was the
    # first action, and its two legs' tasks run concurrently over the
    # same cache-in-progress, so each leg re-executed the full upstream
    # candidate pipeline (measured at sf0.1: a second full GEMM/UDF
    # pass, ~4-5 CPU-s; at 100 TB a second pass over the corpus-scale
    # candidate generation). count() executes the plan exactly once
    # under normal AQE (coalesced post-shuffle partitions, runtime
    # joins), fills the cache, and both union legs then read blocks.
    ed = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).persist()
    try:
        n_ed = ed.count()
        n = _loop_width(n_ed, edges.sparkSession)
        und = _ckpt(
            ed.union(ed.select(F.col("b").alias("a"), F.col("a").alias("b")))
            .repartition(n, "a", "b")
            .distinct()
        )
    finally:
        ed.unpersist()
    # Seed labels with the FIRST neighbor-min round fused into the node
    # scan (r10): comp₀(v) = min(v, min neighbors) is exactly what the
    # old identity-seeded loop computed in its first propagation, for
    # the price of the distinct-node aggregate the seed paid anyway —
    # one round's joins removed outright. (repartition(n, key) followed
    # by groupBy(key) shares the one exchange: HashPartitioning(key, n)
    # satisfies the aggregate's required distribution.)
    labels = _ckpt(
        und.repartition(n, "a")
        .groupBy("a")
        .agg(F.min("b").alias("_mb"))
        .select(F.col("a").alias("node"), F.least("a", "_mb").alias("comp"))
    )
    comp_type = labels.schema["comp"].dataType
    for _ in range(max_iter):
        msgs = und.join(labels, und.a == labels.node).select(
            F.col("b").alias("node"), "comp",
            F.lit(None).cast(comp_type).alias("_old"),
        )
        # No per-round persists (r11): the round has exactly ONE
        # materializing job — the checkpoint below — and within that job
        # ReuseExchange deduplicates prop's and step's repeated subtrees
        # (shuffle map sides run once; broadcast builds are shared).
        # The r10 lazy persists only added block-manager writes and
        # extra jobs per round — A/B'd on the three survivor queries:
        # jobs 75/49/47 -> 61/44/42, CPU −6..13%, identical labels.
        # One aggregate yields both the neighbor-min comp AND the
        # node's previous label (min over the single tagged labels row
        # — every und node has a labels row, so _old is never NULL
        # after the aggregate).
        prop = (
            msgs.union(
                labels.select("node", "comp", F.col("comp").alias("_old"))
            )
            .repartition(n, "node")
            .groupBy("node")
            .agg(F.min("comp").alias("comp"), F.min("_old").alias("_old"))
        )
        # HOOK (Shiloach–Vishkin, r10): each node reports its improved
        # minimum back to its PREVIOUS label ("parent"), so the round's
        # best minimum re-attaches at the top of every label tree instead
        # of crawling outward one neighbor hop per round. On the real
        # semantic survivor graph at sf0.1 this alone cut 9 rounds to 4
        # (measured by replaying the exact rep-pair edge set); pure
        # pointer jumping cut nothing there because the min-label
        # wavefront, not pointer-chain depth, was the binding distance.
        hooks = (
            prop.repartition(n, "_old")
            .groupBy(F.col("_old").alias("node"))
            .agg(F.min("comp").alias("_hc"))
        )
        hooked = (
            prop.join(hooks, "node", "left")
            .select(
                "node",
                F.least("comp", F.coalesce("_hc", "comp")).alias("comp"),
                "_old",
            )
        )
        # Pointer jumping: comp ← comp(comp(node)), applied TWICE per
        # round. Chains/trees converge in O(log₄) rounds; comp is
        # always a node id present in the label frame, so the
        # self-joins always match.
        jump = hooked.select(
            F.col("node").alias("_jn"), F.col("comp").alias("_jc")
        )
        step = (
            hooked.join(jump, hooked.comp == jump._jn)
            .select(
                hooked.node,
                F.least(hooked.comp, jump._jc).alias("comp"),
                hooked._old,
            )
        )
        jump2 = step.select(
            F.col("node").alias("_jn"), F.col("comp").alias("_jc")
        )
        # Convergence rides the checkpoint job (r11): labels only
        # ever DECREASE pointwise over a fixed node set, so the
        # round is the fixpoint iff it changed no label. The
        # changed-count is an observe() metric on the exact frame
        # being checkpointed — zero extra actions, works for any
        # id type (no numeric cast), and a NULL comparison (never
        # expected — see prop) conservatively counts as changed.
        obs = Observation()
        new_full = _ckpt(
            step.join(jump2, step.comp == jump2._jn)
            .select(
                step.node,
                F.least(step.comp, jump2._jc).alias("comp"),
                step._old,
            )
            .observe(
                obs,
                F.sum(
                    F.coalesce(
                        (F.col("comp") != F.col("_old")).cast("long"),
                        F.lit(1),
                    )
                ).alias("chg"),
            )
        )
        labels = new_full.select("node", "comp")
        if not obs.get["chg"]:
            break
    return labels

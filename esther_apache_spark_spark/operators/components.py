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

    und = _ckpt(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = _ckpt(
        und.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("comp"))
    )
    for _ in range(max_iter):
        msgs = und.join(labels, und.a == labels.node).select(
            F.col("b").alias("node"), "comp"
        )
        prop = _ckpt(  # materialize before the self-join below
            msgs.union(labels.select("node", "comp"))
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )
        # Pointer jumping: comp ← comp(comp(node)). Neighbor propagation
        # alone needs diameter rounds (a k-chain takes k); composing the
        # label map with itself each round gives O(log diameter). comp is
        # always a node id present in the label frame, so the self-join
        # always matches.
        jump = prop.select(F.col("node").alias("_jn"), F.col("comp").alias("_jc"))
        new_labels = _ckpt(
            prop.join(jump, prop.comp == jump._jn)
            .select(prop.node, F.least(prop.comp, jump._jc).alias("comp"))
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels

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
- ``localCheckpoint`` after every round truncates the lineage; without
  it the plan doubles per iteration and the driver, not the data,
  becomes the bottleneck.
- The convergence check is a count of changed labels — one tiny action
  per round, the canonical Pregel-style stop condition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(node, comp) for every node appearing in ``edges``; ``comp`` is
    the minimum node id of the node's connected component. Edges are
    treated as undirected; self-loops and duplicate edges are fine."""
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("comp"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        msgs = und.join(labels, und.a == labels.node).select(
            F.col("b").alias("node"), "comp"
        )
        prop = (
            msgs.union(labels.select("node", "comp"))
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint()  # materialize before the self-join below
        )
        # Pointer jumping: comp ← comp(comp(node)). Neighbor propagation
        # alone needs diameter rounds (a k-chain takes k); composing the
        # label map with itself each round gives O(log diameter). comp is
        # always a node id present in the label frame, so the self-join
        # always matches.
        jump = prop.select(F.col("node").alias("_jn"), F.col("comp").alias("_jc"))
        new_labels = (
            prop.join(jump, prop.comp == jump._jn)
            .select(prop.node, F.least(prop.comp, jump._jc).alias("comp"))
            .localCheckpoint()
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

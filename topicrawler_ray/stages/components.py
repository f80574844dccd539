"""Distributed connected components over a pair/edge Dataset.

The dedup operators in this package (``dedup.py``) emit *pairs* of
near-duplicate documents.  Turning pairs into an actionable keep/drop
decision needs the transitive closure: if A~B and B~C then {A,B,C} is
ONE duplicate cluster and exactly one canonical member survives.  This
module computes that closure Ray-Data-first.

Algorithm: iterative **min-label propagation** (the label of every
node converges to the minimum node id reachable from it):

* ``labels`` starts as ``label(v) = v`` for every node.
* each round: join ``edges`` (normalized to both directions) with
  ``labels`` on the edge source, producing ``(dst, label(src))``
  candidates; union with the current labels; ``groupby(node).min``.
* labels are non-increasing, so ``sum(label)`` strictly decreases
  until the fixpoint - ONE cheap scalar aggregate per round is the
  convergence test (no driver-side diffing of label tables).

Scale notes (100 TB corpus, billions of pairs):

* every round is two hash-partitioned exchanges on the node id (one
  join, one groupby-min) - no driver materialization, no broadcast.
* rounds needed = graph diameter.  Near-dup clusters are shallow
  (star-like around a template page), so convergence is typically
  2-4 rounds; ``max_rounds`` bounds pathological chains and the
  operator raises rather than silently returning a non-fixpoint.
* a mega-cluster makes its minimum label a hot join key; the groupby
  side pre-combines per block (Ray's hash aggregate), so the hot key
  costs one reducer's worth of rows per round, not a full skew stall.
* ``star_edges_from_keys`` builds the edge set from a (key, node)
  membership table *without* the per-key quadratic pair explosion:
  every node of a key links to the key's minimum node (a star has the
  same components as the clique).

Reference context: the reference engine stops at URL-seen exact dedup
(`lt.ltbot` SeenFilter); cluster-forming dedup is part of the
"beyond the reference" training-data surface (SURVEY.md) alongside
MinHash/SimHash pair generation.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from .dedup import _default_partitions


def star_edges_from_keys(ds, key_column: str, node_column: str):
    """Collapse a (key, node) membership table into star edges
    ``(node, min-node-of-key)``.

    Input rows need not be distinct.  Output excludes self-loops and
    is distinct.  One exchange on ``key_column``.
    """

    def to_star(group: pd.DataFrame) -> pd.DataFrame:
        nodes = group[node_column].unique()
        lo = nodes.min()
        others = nodes[nodes != lo]
        return pd.DataFrame({"src": others, "dst": lo})

    edges = ds.groupby(key_column).map_groups(to_star, batch_format="pandas")
    # distinct (src, dst): a node pair may share many keys.  The
    # repartition clears the aggregate's 0-column empty blocks, which
    # would otherwise kill a downstream join (ray-2.49 quirk).
    return (
        edges.groupby(["src", "dst"])
        .count()
        .select_columns(["src", "dst"])
        .repartition(_default_partitions(None))
    )


def _directed_both(edges):
    """Normalize an edge list to both directions (src->dst, dst->src)."""

    def both(batch: pa.Table) -> pa.Table:
        src = batch.column("src")
        dst = batch.column("dst")
        return pa.table(
            {
                "src": pa.concat_arrays(
                    [src.combine_chunks(), dst.combine_chunks()]
                ),
                "dst": pa.concat_arrays(
                    [dst.combine_chunks(), src.combine_chunks()]
                ),
            }
        )

    return edges.map_batches(both, batch_format="pyarrow")


def connected_components(
    edges,
    nodes,
    node_column: str = "doc_id",
    max_rounds: int = 16,
    num_partitions: int | None = None,
):
    """Label every node with the minimum node id of its component.

    ``edges``: Dataset with int64 columns ``src``/``dst`` (undirected;
    either orientation, duplicates fine).  ``nodes``: Dataset holding
    the node universe in ``node_column`` (isolated nodes label
    themselves).  Returns a Dataset ``(node_column, component)``.

    Each round is join + groupby-min on the node id; convergence is
    detected by the monotone ``sum(label)`` scalar.  Raises
    ``RuntimeError`` if ``max_rounds`` is hit before the fixpoint
    (raise the bound for high-diameter graphs).
    """
    nparts = num_partitions or _default_partitions(None)

    import ray.data

    # sentinel edge (-1 -> -1): keeps the join's left side non-empty
    # and typed when the edge set is EMPTY (ray-2.49 0-column empty
    # block quirk); -1 is never a node id, so the inner join against
    # labels drops it every round
    sentinel = ray.data.from_items([{"src": -1, "dst": -1}])
    directed = _directed_both(edges).union(sentinel).materialize()

    def self_label(batch: pa.Table) -> pa.Table:
        v = batch.column(node_column)
        return pa.table({"node": v, "label": v})

    labels = nodes.select_columns([node_column]).map_batches(
        self_label, batch_format="pyarrow"
    )

    prev_sum = None
    for _ in range(max_rounds):
        labels = labels.materialize()
        cur = labels.sum("label")
        cur_sum = cur if not isinstance(cur, dict) else cur["sum(label)"]
        if prev_sum is not None and cur_sum == prev_sum:
            return labels.map_batches(
                lambda b: b.rename_columns([node_column, "component"]),
                batch_format="pyarrow",
            )
        prev_sum = cur_sum

        # candidates: for every directed edge (src->dst), dst may take
        # src's current label
        cand = directed.join(
            labels,
            join_type="inner",
            num_partitions=nparts,
            on=("src",),
            right_on=("node",),
        ).select_columns(["dst", "label"])
        cand = cand.map_batches(
            lambda b: b.rename_columns(["node", "label"]),
            batch_format="pyarrow",
        )
        labels = labels.union(cand).groupby("node").min("label")
        # rename min(label) -> label; repartition clears the
        # aggregate's 0-column empty blocks before next round's join
        labels = labels.map_batches(
            lambda b: b.rename_columns(["node", "label"]),
            batch_format="pyarrow",
        ).repartition(nparts)
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds; "
        "raise max_rounds for high-diameter graphs"
    )


def component_summary(
    cc, node_column: str = "doc_id", num_partitions: int | None = None
):
    """Decorate a ``connected_components`` result with the cluster size
    and the keep decision: ``(node, component, cluster_size,
    is_canonical)`` where the canonical member is the component's
    minimum node id (the component label itself).

    One groupby(component) + one join back on component.
    """
    nparts = num_partitions or _default_partitions(None)
    sizes = (
        cc.groupby("component")
        .count()
        .map_batches(
            lambda b: b.rename_columns(["component", "cluster_size"]),
            batch_format="pyarrow",
        )
        .repartition(nparts)  # clear empty 0-column aggregate blocks
    )
    joined = cc.join(
        sizes, join_type="inner", num_partitions=nparts, on=("component",)
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.append_column(
            "is_canonical",
            pc.equal(batch.column(node_column), batch.column("component")),
        ).select([node_column, "component", "cluster_size", "is_canonical"])

    return joined.map_batches(finish, batch_format="pyarrow")

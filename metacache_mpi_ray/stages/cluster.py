"""Cluster assignment — verified edges -> (doc_id, cluster_id, is_dup).

Two interchangeable implementations of connected components:

* ``assign_clusters`` — driver-side union-find over the (small) verified
  edge list, labels broadcast once via ``ray.put`` and applied to every
  doc batch (the broadcast-small-side join pattern, SURVEY.md §2.4 J2).
* ``propagate_min_labels`` — fully distributed iterative min-label
  propagation over the edge list (for edge lists too large for one
  process): each round joins current labels onto edges, takes per-node
  min of neighbor labels, repeats to fixpoint. The analog of the
  reference's tree-reduction candidate merge (/root/reference/src/
  querying.h:892-1071) without the rank-0 bottleneck.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Min


@ray.remote
def _uf_task(*tabs):
    """Union-find over edge blocks as ONE task: the edge bytes and the
    label table never cross the driver heap (round-3 — the driver-side
    edge streaming was part of the fixed serial slice of a 2-CPU run);
    the task's return object is the broadcast the assigners read."""
    from metacache_mpi_ray.state.unionfind import connected_components_arrays

    a = [t["a"].to_numpy(zero_copy_only=False) for t in tabs if len(t)]
    b = [t["b"].to_numpy(zero_copy_only=False) for t in tabs if len(t)]
    if not a:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    return connected_components_arrays(np.concatenate(a), np.concatenate(b))


@ray.remote(num_returns=2)
def _forest_task(tab):
    """One edge block -> its local spanning forest as (child, parent)
    arrays: contraction preserves connectivity exactly while shrinking
    the block's edge count to < its distinct-node count (cross-band
    duplicate pairs and within-block redundancy vanish here, in
    PARALLEL, before the single serial merge task)."""
    from metacache_mpi_ray.state.unionfind import connected_components_arrays

    if len(tab) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    nodes, labels = connected_components_arrays(
        tab["a"].to_numpy(zero_copy_only=False),
        tab["b"].to_numpy(zero_copy_only=False),
    )
    m = labels != nodes
    return nodes[m], labels[m]


@ray.remote
def _uf_forest_task(*parts):
    """Final serial merge over the per-block forests (child, parent
    alternating): input is already contracted, so this touches ~#nodes
    edges instead of the raw candidate-edge count."""
    from metacache_mpi_ray.state.unionfind import connected_components_arrays

    a = [x for x in parts[0::2] if len(x)]
    b = [x for x in parts[1::2] if len(x)]
    if not a:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    return connected_components_arrays(np.concatenate(a), np.concatenate(b))


def assign_clusters(docs, edges, *, id_col: str = "doc_id"):
    """docs + verified edges -> clusters dataset (doc_id, cluster_id, is_dup)."""
    refs = edges.to_arrow_refs()
    if len(refs) > 1:
        # two-level components: parallel per-block contraction, then one
        # serial merge over the forests — the serial slice of a low-CPU
        # run shrinks by the block count x band multiplicity
        forests = [_forest_task.remote(r) for r in refs]
        labels_ref = _uf_forest_task.remote(
            *[r for pair in forests for r in pair]
        )
    elif refs:
        labels_ref = _uf_task.remote(*refs)
    else:
        labels_ref = ray.put(
            (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        )

    def assign(batch: pa.Table) -> pa.Table:
        nodes_s, labs = ray.get(labels_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if len(nodes_s) == 0:
            dup = np.zeros(len(ids), dtype=bool)
            out = ids.astype(np.int64)
        else:
            pos = np.minimum(np.searchsorted(nodes_s, ids), len(nodes_s) - 1)
            dup = nodes_s[pos] == ids
            out = np.where(dup, labs[pos], ids).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "cluster_id": pa.array(out, type=pa.int64()),
                "is_dup": pa.array(dup, type=pa.bool_()),
            }
        )

    return docs.map_batches(assign, batch_format="pyarrow")


def assign_clusters_distributed(
    docs, edges, *, id_col: str = "doc_id", num_partitions: int = 32
):
    """Fully distributed cluster assignment: connected components via
    min-label propagation, then a left-outer hash join of the label
    table onto docs. The scale path when the dup subset itself is too
    large for one driver-side DSU / one broadcast object."""
    labels = propagate_min_labels(edges, num_partitions=num_partitions)
    joined = docs.select_columns([id_col]).join(
        labels,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=(id_col,),
    )

    def finish(batch: pa.Table) -> pa.Table:
        # nullable int64 must stay in Arrow: a numpy conversion would go
        # through float64 and round doc_ids above 2**53
        lab = batch["cluster_id"]
        return pa.table(
            {
                "doc_id": batch[id_col].cast(pa.int64()),
                "cluster_id": pc.coalesce(lab, batch[id_col]).cast(pa.int64()),
                "is_dup": pc.is_valid(lab),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def propagate_min_labels(edges, max_iters: int = 50, num_partitions: int = 32):
    """Distributed connected components over an edge list.

    Returns a Dataset (doc_id, cluster_id) covering every id that occurs
    in an edge. Rounds: label(v) = min(label(v), min over neighbors u of
    label(u), label(label(v))) until no label changes. The label(label(v))
    term is pointer-jumping (one extra self-join per round), which makes
    the round count O(log diameter) instead of O(diameter) — without it a
    chain-shaped component longer than ``max_iters`` hops would silently
    mislabel. Dedup clusters are near-cliques (2-3 rounds either way);
    the shortcut is the guarantee for adversarial shapes at scale.
    Raises if the fixpoint is not reached within ``max_iters`` rounds.
    """

    def seed(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        node = np.concatenate([a, b])
        lab = np.concatenate([np.minimum(a, b), np.minimum(a, b)])
        return pa.table({"node": pa.array(node), "lab": pa.array(lab)})

    # undirected edge list, symmetrized once
    def sym(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b])),
                "dst": pa.array(np.concatenate([b, a])),
            }
        )

    def drop_empty_blocks(mat):
        # Ray 2.49's hash-shuffle join/groupby emit zero-row blocks
        # carrying the operator's INTERNAL schema (the join's
        # pre-projection columns, or no columns at all) — projections
        # skip empty blocks, so the stowaways survive select/rename and
        # later poison an acero join whose partition sees only them
        # ("No match ... for key field"). Prune them by block ref:
        # metadata-only, no data moves.
        refs = [
            ref
            for bundle in mat.iter_internal_ref_bundles()
            for ref, meta in zip(bundle.block_refs, bundle.metadata)
            if meta.num_rows
        ]
        if not refs:
            empty = pa.array([], type=pa.int64())
            return rd.from_arrow(pa.table({"node": empty, "lab": empty}))
        return rd.from_arrow_refs(refs)

    sym_edges = edges.map_batches(sym, batch_format="pyarrow").materialize()
    labels = drop_empty_blocks(
        edges.map_batches(seed, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("lab", alias_name="lab"))
        .materialize()
    )

    for rnd in range(max_iters):
        # neighbor labels: join labels onto edge sources, emit to dst
        # each join materializes as its OWN execution: two hash-shuffle
        # joins inside one streaming plan cross-wire their bundles in
        # Ray 2.49 (a projected bundle from one join surfaces, raw, at
        # the other join's input — observed as "no match for FieldRef").
        lsrc = labels.rename_columns({"node": "src"})
        prop = drop_empty_blocks(
            sym_edges.join(
                lsrc, join_type="inner", num_partitions=num_partitions, on=("src",)
            ).select_columns(["dst", "lab"]).rename_columns({"dst": "node"})
            .materialize()
        )
        merged = labels.union(prop)
        if rnd >= 2:
            # pointer jumping: lab(v) <- lab(lab(v)). lab(v) is always a
            # node of v's component, so it has its own row in `labels`.
            # Engaged only once the near-clique common case (2-3 rounds)
            # has had its chance to converge without the extra shuffle;
            # from here rounds double the reach, so high-diameter
            # components finish in O(log d) total.
            parent = labels.rename_columns({"node": "lab", "lab": "lab2"})
            short = drop_empty_blocks(
                labels.join(
                    parent, join_type="inner", num_partitions=num_partitions,
                    on=("lab",),
                ).select_columns(["node", "lab2"]).rename_columns({"lab2": "lab"})
                .materialize()
            )
            merged = merged.union(short)
        new_labels = drop_empty_blocks(
            merged
            .groupby("node")
            .aggregate(Min("lab", alias_name="lab"))
            .materialize()
        )
        # fixpoint check: any label decreased?
        old_sum = labels.sum("lab")
        new_sum = new_labels.sum("lab")
        labels = new_labels
        if old_sum == new_sum:
            break
    else:
        raise RuntimeError(
            f"propagate_min_labels: no fixpoint within {max_iters} rounds "
            "(component diameter > 2**rounds should be impossible — "
            "check the edge list for non-integer or null ids)"
        )
    return labels.rename_columns({"node": "doc_id", "lab": "cluster_id"})

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

from metacache_mpi_ray.functions.blocks import drop_empty_blocks
from metacache_mpi_ray.stages.windows import _segments, _split_frag


def _exact_label_sum(ds) -> int:
    """Overflow-free sum of the int63 ``lab`` column.

    Summed as three 21-bit limbs (each partial sum stays < 2^63 for up
    to 2^42 rows) and reassembled with Python bignums — exact where a
    plain int64 sum of content-hash-scale labels wraps.
    """
    mask = (1 << 21) - 1

    def limbs(t: pa.Table) -> pa.Table:
        lab = t["lab"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "lo": pa.array(lab & mask, type=pa.int64()),
                "mid": pa.array((lab >> 21) & mask, type=pa.int64()),
                "hi": pa.array(lab >> 42, type=pa.int64()),
            }
        )

    s = ds.map_batches(limbs, batch_format="pyarrow").sum(["lo", "mid", "hi"])
    if s is None:  # empty dataset
        return 0
    return int(s["sum(lo)"]) + (int(s["sum(mid)"]) << 21) + (int(s["sum(hi)"]) << 42)


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
    from metacache_mpi_ray.stages.joins import clamp_join_partitions

    num_partitions = clamp_join_partitions(num_partitions)  # deadlock guard
    labels = propagate_min_labels(edges, num_partitions=num_partitions)
    if labels.count() == 0:
        # zero edges -> every doc is its own singleton; Ray 2.49's hash
        # join breaks on a globally-empty side (each partition
        # reconstructs a schema-less empty right table), so skip it
        def singleton(batch: pa.Table) -> pa.Table:
            ids = batch[id_col].cast(pa.int64())
            return pa.table(
                {
                    "doc_id": ids,
                    "cluster_id": ids,
                    "is_dup": pa.array(
                        np.zeros(len(batch), dtype=bool), type=pa.bool_()
                    ),
                }
            )

        return docs.select_columns([id_col]).map_batches(
            singleton, batch_format="pyarrow"
        )
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
    term is pointer-jumping, which makes the round count O(log diameter)
    instead of O(diameter) — without it a chain-shaped component longer
    than ``max_iters`` hops would silently mislabel. It costs no extra
    shuffle: from round 3 the current (label -> node) pairs are unioned
    into the join's edge side, so the one hash join per round propagates
    along graph edges AND label pointers at once. Dedup clusters are
    near-cliques (2-3 rounds; the pointer edges never engage).

    The per-round min-aggregate uses sort + per-block segmented min with
    a driver stitch of block-edge groups (the A2 topk_per_group pattern)
    instead of ``groupby().aggregate(Min)``: at 1M distinct nodes the
    hash aggregate measured 13-24 s/round against 1.5 s for the sorted
    kernel; only two rows per block cross the driver.
    Raises if the fixpoint is not reached within ``max_iters`` rounds.
    """
    from metacache_mpi_ray.stages.joins import clamp_join_partitions

    num_partitions = clamp_join_partitions(num_partitions)  # deadlock guard

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

    label_schema = pa.schema([("node", pa.int64()), ("lab", pa.int64())])

    def seg_min_kernel(t: pa.Table) -> pa.Table:
        # per-block (node -> min lab) over globally-sorted rows; the
        # first and last node of each block may continue in a neighbor
        # block, so they are flagged as fragments for the driver stitch
        empty_i64 = pa.array([], type=pa.int64())
        if t.num_rows == 0:
            return pa.table(
                {"node": empty_i64, "lab": empty_i64,
                 "__frag": pa.array([], type=pa.bool_())}
            )
        node = t["node"].to_numpy(zero_copy_only=False)
        lab = t["lab"].to_numpy(zero_copy_only=False)
        starts, _ = _segments(node)
        frag = np.zeros(len(starts), dtype=bool)
        frag[0] = frag[-1] = True
        return pa.table(
            {
                "node": pa.array(node[starts], type=pa.int64()),
                "lab": pa.array(
                    np.minimum.reduceat(lab, starts), type=pa.int64()
                ),
                "__frag": pa.array(frag),
            }
        )

    def grouped_min(ds):
        srt = ds.sort("node")
        final, frags = _split_frag(
            # batch_size=None: whole sorted blocks, so exactly two
            # fragment rows per BLOCK reach the driver stitch (the
            # default 1024-row batches would ship 2 rows per ~1024)
            srt.map_batches(
                seg_min_kernel, batch_format="pyarrow", batch_size=None
            ),
            ["node", "lab"],
        )
        if len(frags):
            stitched = (
                frags.groupby("node", as_index=False)["lab"].min()
                .astype({"node": "int64", "lab": "int64"})
            )
            final = final.union(
                rd.from_arrow(pa.Table.from_pandas(stitched, preserve_index=False))
            )
        return drop_empty_blocks(final.materialize(), schema=label_schema)

    sym_edges = edges.map_batches(sym, batch_format="pyarrow").materialize()
    labels = grouped_min(edges.map_batches(seed, batch_format="pyarrow"))
    if labels.count() == 0:
        # zero edges: nothing to propagate, and an all-empty dataset on
        # either side of the per-round hash join would surface the
        # schema-less-empty-partition acero error this module documents.
        # Build the output-schema empty table directly — rename_columns
        # is a projection and projections SKIP empty blocks
        return rd.from_arrow(
            pa.schema(
                [("doc_id", pa.int64()), ("cluster_id", pa.int64())]
            ).empty_table()
        )

    old_sum = None
    for rnd in range(max_iters):
        # neighbor (and, from round 3, label-pointer) propagation: one
        # hash join per round over the combined edge set
        join_edges = sym_edges
        if rnd >= 2:
            # pointer jumping as EDGES: (src=lab(v), dst=v) rows make the
            # join deliver lab(lab(v)) to v. Engaged only once the
            # near-clique common case (2-3 rounds) has had its chance to
            # converge without them; from here reach doubles per round.
            def ptr_edges(t: pa.Table) -> pa.Table:
                return pa.table({"src": t["lab"], "dst": t["node"]})

            join_edges = sym_edges.union(
                labels.map_batches(ptr_edges, batch_format="pyarrow")
            )
        lsrc = labels.rename_columns({"node": "src"})
        prop = drop_empty_blocks(
            join_edges.join(
                lsrc, join_type="inner", num_partitions=num_partitions, on=("src",)
            ).select_columns(["dst", "lab"]).rename_columns({"dst": "node"})
            .materialize(),
            schema=label_schema,
        )
        new_labels = grouped_min(labels.union(prop))
        # fixpoint check: any label decreased? Labels only ever
        # decrease and the node set is fixed, so an unchanged EXACT sum
        # means an unchanged table. int64 sum("lab") would wrap for
        # 2^62-scale content-hash ids at >2 rows, so the sum is taken
        # over three 21-bit limbs and reassembled in Python ints — one
        # pass over labels per round, same as the naive sum. The
        # previous round's sum is carried, not recomputed.
        if old_sum is None:
            old_sum = _exact_label_sum(labels)
        new_sum = _exact_label_sum(new_labels)
        labels = new_labels
        if old_sum == new_sum:
            break
        old_sum = new_sum
    else:
        raise RuntimeError(
            f"propagate_min_labels: no fixpoint within {max_iters} rounds "
            "(component diameter > 2**rounds should be impossible — "
            "check the edge list for non-integer or null ids)"
        )
    return labels.rename_columns({"node": "doc_id", "lab": "cluster_id"})

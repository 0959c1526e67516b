"""Rank-aware candidate merge + bounded insert + hit-threshold
classification — the reference's candidate post-processing as a grouped
operator family.

Reference semantics re-expressed (/root/reference/src/candidates.h:
90-102, 191-289 and classification.cpp:227-262):

1. *merge below rank*: a candidate below ``merge_below`` is replaced by
   its ancestor at that rank before insertion (``rules.mergeBelow``,
   candidates.h:241-244), so per-sequence hits pool at the chosen rank.
2. *bounded insert*: per query, one entry per taxon keeping its MAX
   hits (candidates.h:262-268 "update, if more hits"), sorted by hits
   descending, truncated at ``max_candidates``. The reference's list is
   stream-order sensitive when full; this operator is the
   order-independent closure (merge first, then one global top-k) —
   deterministic under any partitioning, tie-broken by node id.
3. *classify*: the best candidate must clear ``hits_min``
   (classification.cpp:242); every further candidate with
   hits > (best - hits_min) * hits_diff_fraction joins a ranked-LCA
   vote (classification.cpp:247-262); an LCA shallower than
   ``highest_rank`` is unclassified.

Dispatch shape: the merge is a grouped Max + the engine's
sort-and-segment top-k (stages/windows.topk_per_group); classification
is ONE sort by (query, rank) + a vectorized per-batch segment kernel
(per-rank min/max reducts over the broadcast lineage matrix — no
per-query Python), with boundary queries stitched in an O(#blocks)
driver pass. The taxonomy rides in one broadcast object, like the
reference's in-memory taxonomy cache.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Max

from metacache_mpi_ray.stages.taxonomy import Taxonomy
from metacache_mpi_ray.stages.windows import topk_per_group

_I64MAX = np.iinfo(np.int64).max
_I64MIN = np.iinfo(np.int64).min


def merge_candidates(
    cand,
    tax: Taxonomy,
    *,
    merge_below: str | None = None,
    max_candidates: int = 4,
):
    """(query_id, node_id, hits) candidate rows -> per-query bounded
    candidate lists (query_id, node_id, hits, rank) with rank 1-based by
    hits descending (ties by node_id)."""
    if merge_below is not None:
        tref = ray.put(tax)
        rank = merge_below

        def remap(t: pa.Table) -> pa.Table:
            tx = ray.get(tref)
            nodes = t["node_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "query_id": t["query_id"],
                    "node_id": pa.array(tx.ancestor(nodes, rank), type=pa.int64()),
                    "hits": t["hits"],
                }
            )

        cand = cand.map_batches(remap, batch_format="pyarrow")
    merged = cand.groupby(["query_id", "node_id"]).aggregate(
        Max("hits", alias_name="hits")
    )
    return topk_per_group(
        merged,
        "query_id",
        "hits",
        max_candidates,
        descending=True,
        tiebreak=["node_id"],
    )


def _classify_segment_rows(
    tax: Taxonomy,
    hits: np.ndarray,
    nodes: np.ndarray,
    starts: np.ndarray,
    sizes: np.ndarray,
    hits_min: int,
    frac: float,
    highest_rank: str | None,
):
    """Vectorized classification over contiguous per-query segments of
    rank-ordered candidate rows. Returns per-segment
    (best_node, best_hits, lca_node, classified)."""
    nseg = len(starts)
    best_hits = hits[starts]
    best_node = nodes[starts]
    thr = np.where(
        best_hits > hits_min, (best_hits - hits_min) * frac, 0.0
    )
    seg_of = np.repeat(np.arange(nseg), sizes)
    incl = hits > thr[seg_of]
    incl[starts] = True  # the best candidate always votes (lca seed)
    # per-rank agreement across included rows: min == max and set
    lin = tax.lineage[tax._rows(nodes)]
    lin_min = np.where(incl[:, None], lin, _I64MAX)
    lin_max = np.where(incl[:, None], lin, _I64MIN)
    mins = np.minimum.reduceat(lin_min, starts, axis=0)
    maxs = np.maximum.reduceat(lin_max, starts, axis=0)
    agree = (mins == maxs) & (mins >= 0)
    any_agree = agree.any(axis=1)
    depth_idx = np.where(
        any_agree, agree.shape[1] - 1 - agree[:, ::-1].argmax(axis=1), 0
    )
    lca = mins[np.arange(nseg), depth_idx]
    # no agreeing rank at all -> root of the best candidate's lineage
    root_fallback = tax.lineage[tax._rows(best_node), 0]
    lca = np.where(any_agree, lca, root_fallback)
    classified = best_hits >= hits_min
    if highest_rank is not None:
        min_depth = tax.rank_names.index(highest_rank)
        classified &= depth_idx >= min_depth
    return best_node, best_hits, lca, classified


def classify_merged(
    topk,
    tax: Taxonomy,
    *,
    hits_min: int = 0,
    hits_diff_fraction: float = 1.0,
    highest_rank: str | None = None,
):
    """Bounded candidate lists (query_id, node_id, hits, rank) ->
    per-query classification (query_id, best_node, best_hits, lca_node,
    classified)."""
    tref = ray.put(tax)
    sorted_ds = (
        topk.select_columns(["query_id", "node_id", "hits", "rank"])
        .sort(["query_id", "rank"])
        .materialize()
    )

    def kernel(t: pa.Table) -> pa.Table:
        n = len(t)
        empty = pa.table(
            {"query_id": pa.array([], type=pa.int64()),
             "best_node": pa.array([], type=pa.int64()),
             "best_hits": pa.array([], type=pa.int64()),
             "lca_node": pa.array([], type=pa.int64()),
             "classified": pa.array([], type=pa.bool_()),
             "is_frag": pa.array([], type=pa.bool_())}
        )
        if n == 0:
            return empty
        tx = ray.get(tref)
        q = t["query_id"].to_numpy(zero_copy_only=False)
        nodes = t["node_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hits = t["hits"].to_numpy(zero_copy_only=False).astype(np.int64)
        change = np.empty(n, dtype=bool)
        change[0] = True
        np.not_equal(q[1:], q[:-1], out=change[1:])
        starts = np.flatnonzero(change)
        sizes = np.diff(np.append(starts, n))
        nseg = len(starts)
        interior = np.ones(nseg, dtype=bool)
        interior[0] = interior[-1] = False
        cols = {k: [] for k in ("q", "bn", "bh", "lca", "cl", "frag")}
        if interior.any():
            s_i = starts[interior]
            z_i = sizes[interior]
            # interior segments are exactly the contiguous rows between
            # the end of the first segment and the start of the last
            sel = np.arange(starts[1], starts[-1])
            rel_starts = s_i - starts[1]
            bn, bh, lca, cl = _classify_segment_rows(
                tx, hits[sel], nodes[sel], rel_starts, z_i,
                hits_min, hits_diff_fraction, highest_rank,
            )
            cols["q"].append(q[s_i])
            cols["bn"].append(bn)
            cols["bh"].append(bh)
            cols["lca"].append(lca)
            cols["cl"].append(cl)
            cols["frag"].append(np.zeros(len(s_i), dtype=bool))
        # boundary queries ship raw rows (node in best_node, hits in
        # best_hits, rank in lca_node) for the driver stitch
        fsel = []
        for gi in ([0] if nseg == 1 else [0, nseg - 1]):
            fsel.extend(range(starts[gi], starts[gi] + sizes[gi]))
        fsel = np.asarray(fsel, dtype=np.int64)
        cols["q"].append(q[fsel])
        cols["bn"].append(nodes[fsel])
        cols["bh"].append(hits[fsel])
        cols["lca"].append(t["rank"].to_numpy(zero_copy_only=False)[fsel])
        cols["cl"].append(np.zeros(len(fsel), dtype=bool))
        cols["frag"].append(np.ones(len(fsel), dtype=bool))
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(cols["q"]), type=pa.int64()),
                "best_node": pa.array(np.concatenate(cols["bn"]), type=pa.int64()),
                "best_hits": pa.array(np.concatenate(cols["bh"]), type=pa.int64()),
                "lca_node": pa.array(np.concatenate(cols["lca"]), type=pa.int64()),
                "classified": pa.array(np.concatenate(cols["cl"]), type=pa.bool_()),
                "is_frag": pa.array(np.concatenate(cols["frag"]), type=pa.bool_()),
            }
        )

    emitted = sorted_ds.map_batches(kernel, batch_format="pyarrow").materialize()
    out_cols = ["query_id", "best_node", "best_hits", "lca_node", "classified"]
    final = emitted.map_batches(
        lambda t: t.filter(pc.invert(t["is_frag"])).select(out_cols),
        batch_format="pyarrow",
    )
    frags = emitted.map_batches(
        lambda t: t.filter(t["is_frag"]).select(
            ["query_id", "best_node", "best_hits", "lca_node"]
        ),
        batch_format="pyarrow",
    ).to_pandas()
    if len(frags):
        frags = frags.rename(
            columns={"best_node": "node_id", "best_hits": "hits", "lca_node": "rank"}
        )
        frags = frags.drop_duplicates(["query_id", "rank"]).sort_values(
            ["query_id", "rank"]
        )
        qv = frags["query_id"].to_numpy(dtype=np.int64)
        change = np.empty(len(qv), dtype=bool)
        if len(qv):
            change[0] = True
            np.not_equal(qv[1:], qv[:-1], out=change[1:])
            starts = np.flatnonzero(change)
            sizes = np.diff(np.append(starts, len(qv)))
            bn, bh, lca, cl = _classify_segment_rows(
                tax,
                frags["hits"].to_numpy(dtype=np.int64),
                frags["node_id"].to_numpy(dtype=np.int64),
                starts,
                sizes,
                hits_min,
                hits_diff_fraction,
                highest_rank,
            )
            final = final.union(
                rd.from_arrow(
                    pa.table(
                        {
                            "query_id": pa.array(qv[starts], type=pa.int64()),
                            "best_node": pa.array(bn, type=pa.int64()),
                            "best_hits": pa.array(bh, type=pa.int64()),
                            "lca_node": pa.array(lca, type=pa.int64()),
                            "classified": pa.array(cl, type=pa.bool_()),
                        }
                    )
                )
            )
    return final

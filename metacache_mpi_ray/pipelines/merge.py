"""Merge mode — the analog of the reference's standalone ``merge``
command (/root/reference/src/mode_merge.cpp:209-307 +
classification.cpp:889-925): re-combine candidate sets produced by
independent runs (e.g. per-corpus-slice dedup jobs) and re-derive the
final assignment. Evidence in the reference that candidate sets are a
clean serializable intermediate; here the verified edge list is that
intermediate.
"""

from __future__ import annotations

import ray.data

from metacache_mpi_ray.stages.cluster import assign_clusters


def merge_edge_sets(*edge_datasets):
    """Union verified-edge sets from independent runs, dropping
    duplicate pairs (D5 union semantics)."""
    from ray.data.aggregate import Count, Max

    merged = edge_datasets[0]
    for e in edge_datasets[1:]:
        merged = merged.union(e)
    # keep one row per pair; track how many runs agreed
    return merged.groupby(["a", "b"]).aggregate(Count(alias_name="n_runs"))


def merge_cluster_runs(docs, *edge_datasets):
    """Re-cluster a docs dataset from the union of several runs'
    verified edges (the merge-mode pipeline)."""
    merged = merge_edge_sets(*edge_datasets).materialize()
    return assign_clusters(docs, merged)

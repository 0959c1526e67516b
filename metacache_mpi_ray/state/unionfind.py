"""Union-find over candidate edges — the analog of the reference's
ranked-LCA classification (/root/reference/src/classification.cpp:235-265):
candidates are merged into one final assignment per record; here the
assignment is a connected-component (cluster) id, taken as the minimum
doc_id of the component (deterministic representative).

Driver-side DSU is the default: after similarity verification the edge
list is proportional to the number of *duplicate pairs*, which is small
relative to the corpus (and is streamed batch-by-batch, never
materialized as Python rows). For edge lists too big for one process,
``metacache_mpi_ray.stages.cluster`` provides the distributed
min-label-propagation equivalent.
"""

from __future__ import annotations

import numpy as np


class UnionFind:
    """Path-halving DSU over arbitrary int64 ids (dict-backed)."""

    def __init__(self) -> None:
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent
        r = p.setdefault(x, x)
        while r != p[r]:
            p[r] = p[p[r]]
            r = p[r]
        # path compression for x's chain
        while p[x] != r:
            p[x], x = r, p[x]
        return r

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # union by min keeps the representative deterministic
            if ra < rb:
                self.parent[rb] = ra
            else:
                self.parent[ra] = rb

    def add_edge_batch(self, a: np.ndarray, b: np.ndarray) -> None:
        for x, y in zip(a.tolist(), b.tolist()):
            self.union(x, y)

    def labels(self) -> dict[int, int]:
        """doc_id -> min doc_id of its component, for every id seen."""
        return {x: self.find(x) for x in list(self.parent)}


def labels_from_edges(edges_ds, cols=("a", "b")) -> dict[int, int]:
    """Stream an edges Dataset into a DSU; returns doc_id -> cluster_id.

    Only ids that participate in at least one edge appear; every other
    document is its own singleton cluster (cluster_id = doc_id).
    """
    uf = UnionFind()
    ca, cb = cols
    for batch in edges_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        uf.add_edge_batch(
            batch[ca].to_numpy(zero_copy_only=False),
            batch[cb].to_numpy(zero_copy_only=False),
        )
    return uf.labels()

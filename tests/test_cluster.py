"""Direct unit tests for the connected-components kernels — the
correctness-critical core of cluster assignment (stages/cluster.py,
state/unionfind.py). The e2e dedup tests exercise near-clique graphs
only; these cover adversarial shapes (long chains, stars, duplicate and
self edges) and the two-level per-block-forest path explicitly."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from metacache_mpi_ray.stages.cluster import (
    assign_clusters,
    assign_clusters_distributed,
    propagate_min_labels,
)
from metacache_mpi_ray.state.unionfind import (
    UnionFind,
    connected_components_arrays,
)


def _naive_labels(a: np.ndarray, b: np.ndarray) -> dict[int, int]:
    uf = UnionFind()
    uf.add_edge_batch(a, b)
    return uf.labels()


def _graphs():
    rng = np.random.default_rng(7)
    # random sparse graph with duplicate edges in both orders
    a = rng.integers(0, 500, 800).astype(np.int64)
    b = rng.integers(0, 500, 800).astype(np.int64)
    yield "random", np.concatenate([a, b]), np.concatenate([b, a])
    # a 300-hop chain (worst case for min-label propagation)
    n = np.arange(300, dtype=np.int64) + 1000
    yield "chain", n[:-1], n[1:]
    # star: hub is the max id, so every label must hop through the hub
    yield "star", np.full(64, 999, dtype=np.int64), np.arange(64, dtype=np.int64)
    # self edges only: every node is its own singleton component
    s = np.arange(10, dtype=np.int64)
    yield "self", s, s


@pytest.mark.parametrize("name,a,b", list(_graphs()))
def test_connected_components_matches_naive_dsu(name, a, b):
    nodes, labels = connected_components_arrays(a, b)
    assert np.array_equal(nodes, np.sort(nodes)), "nodes must come back sorted"
    got = dict(zip(nodes.tolist(), labels.tolist()))
    assert got == _naive_labels(a, b)


def test_assign_clusters_two_level_matches_single_block(ray_session):
    # a chain split across 8 blocks in shuffled order: every block's local
    # forest is a fragment, so the serial merge must reconnect them
    rng = np.random.default_rng(11)
    n = 257
    a = np.arange(n - 1, dtype=np.int64)
    b = a + 1
    order = rng.permutation(n - 1)
    a, b = a[order], b[order]
    blocks = [
        pa.table({"a": a[i::8], "b": b[i::8]}) for i in range(8)
    ]
    docs = rd.from_pandas(pd.DataFrame({"doc_id": np.arange(n + 50, dtype=np.int64)}))

    multi = rd.from_arrow(blocks)
    assert multi.num_blocks() > 1
    single = rd.from_arrow(pa.concat_tables(blocks)).repartition(1)

    out_m = assign_clusters(docs, multi).to_pandas().sort_values("doc_id")
    out_s = assign_clusters(docs, single).to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(
        out_m.reset_index(drop=True), out_s.reset_index(drop=True)
    )
    # the whole chain collapses to min id 0; ids beyond the chain untouched
    assert (out_m.loc[out_m.doc_id < n, "cluster_id"] == 0).all()
    assert (out_m.loc[out_m.doc_id >= n, "cluster_id"]
            == out_m.loc[out_m.doc_id >= n, "doc_id"]).all()
    assert out_m.loc[out_m.doc_id < n, "is_dup"].all()
    assert not out_m.loc[out_m.doc_id >= n, "is_dup"].any()


def test_propagate_min_labels_long_chain(ray_session):
    # diameter 255 >> max_iters: only the pointer-jumping shortcut makes
    # this converge (O(log d) rounds); without it the old code silently
    # returned wrong labels
    n = 256
    edges = rd.from_pandas(
        pd.DataFrame(
            {"a": np.arange(n - 1, dtype=np.int64) + 10,
             "b": np.arange(n - 1, dtype=np.int64) + 11}
        )
    )
    labels = propagate_min_labels(edges, max_iters=20, num_partitions=4).to_pandas()
    assert len(labels) == n
    assert (labels["cluster_id"] == 10).all()


def test_assign_clusters_distributed_matches_driver(ray_session):
    rng = np.random.default_rng(3)
    a = rng.integers(0, 200, 300).astype(np.int64)
    b = rng.integers(0, 200, 300).astype(np.int64)
    keep = a != b
    a, b = a[keep], b[keep]
    edges = rd.from_pandas(pd.DataFrame({"a": a, "b": b})).repartition(4)
    docs = rd.from_pandas(pd.DataFrame({"doc_id": np.arange(220, dtype=np.int64)}))
    drv = assign_clusters(docs, edges).to_pandas().sort_values("doc_id")
    dst = (
        assign_clusters_distributed(docs, edges, num_partitions=4)
        .to_pandas()
        .sort_values("doc_id")
    )
    pd.testing.assert_frame_equal(
        drv.reset_index(drop=True),
        dst.reset_index(drop=True),
        check_dtype=False,
    )

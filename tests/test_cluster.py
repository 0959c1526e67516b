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


def test_exact_label_sum_no_wraparound(ray_session):
    # content-hash ids are ~2^62; a plain int64 sum wraps at 2 rows
    from metacache_mpi_ray.stages.cluster import _exact_label_sum

    labs = np.array(
        [(1 << 62) + 7, (1 << 62) + 11, (1 << 61) - 1, 0, 12345], dtype=np.int64
    )
    ds = rd.from_pandas(pd.DataFrame({"lab": labs})).repartition(3)
    assert _exact_label_sum(ds) == int(sum(int(x) for x in labs))


def test_propagate_min_labels_hash_scale_ids(ray_session):
    # the fixpoint check must stay exact for 63-bit ids (wraparound of
    # a naive sum would risk a premature break -> wrong labels)
    base = (1 << 62) + 1000
    a = np.array([base + 0, base + 1, base + 5], dtype=np.int64)
    b = np.array([base + 1, base + 2, base + 6], dtype=np.int64)
    edges = rd.from_pandas(pd.DataFrame({"a": a, "b": b})).repartition(2)
    labels = propagate_min_labels(edges, num_partitions=4).to_pandas()
    got = dict(zip(labels["doc_id"], labels["cluster_id"]))
    assert got == {
        base + 0: base + 0, base + 1: base + 0, base + 2: base + 0,
        base + 5: base + 5, base + 6: base + 5,
    }


def test_drop_empty_blocks_all_empty_fallback_schema(ray_session):
    from metacache_mpi_ray.functions.blocks import drop_empty_blocks

    schema = pa.schema([("node", pa.int64()), ("lab", pa.int64())])
    empty = rd.from_arrow(schema.empty_table()).materialize()
    out = drop_empty_blocks(empty, schema=schema)
    assert out.count() == 0
    assert out.schema().base_schema == schema
def test_distributed_cc_crossover_exact_at_scale(ray_session):
    """The >=50M-edge crossover path (cluster_method="distributed")
    pinned as CI (r3 verdict item 7): 30k nodes / 150k random edges (dense -> few propagation rounds),
    distributed min-label propagation must label EVERY node identically
    to the driver DSU. Marked slow-ish but in the default CI list so
    the scale path cannot rot."""
    rng = np.random.default_rng(77)
    n = 30_000
    a = rng.integers(0, n, 150_000).astype(np.int64)
    b = rng.integers(0, n, 150_000).astype(np.int64)
    keep = a != b
    a, b = a[keep], b[keep]
    edges = rd.from_pandas(pd.DataFrame({"a": a, "b": b})).repartition(8)
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64)})
    ).repartition(4)
    drv = assign_clusters(docs, edges).to_pandas().sort_values("doc_id")
    dst = (
        assign_clusters_distributed(docs, edges, num_partitions=8)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert np.array_equal(
        drv["cluster_id"].to_numpy(), dst["cluster_id"].to_numpy()
    )
    assert np.array_equal(drv["is_dup"].to_numpy(), dst["is_dup"].to_numpy())


def test_flagship_distributed_cluster_method_parity(ray_session, corpus_dir):
    """near_dup_pipeline(cluster_method='distributed') returns the same
    clusters as the driver DSU on the planted corpus — the auto switch
    can flip at 50M edges without changing results."""
    from metacache_mpi_ray.config import DedupConfig
    from metacache_mpi_ray.pipelines.dedup import near_dup_pipeline
    from metacache_mpi_ray.stages.ingest import ingest_pages

    docs = ingest_pages(rd.read_parquet(f"{corpus_dir}/pages"))
    cfg = DedupConfig()
    drv = (
        near_dup_pipeline(docs, cfg, num_partitions=4, cluster_method="driver")
        .clusters.to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    dst = (
        near_dup_pipeline(
            docs, cfg, num_partitions=4, cluster_method="distributed"
        )
        .clusters.to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(drv, dst, check_dtype=False)


def test_assign_clusters_distributed_zero_edges(ray_session):
    # a no-duplicate corpus produces an empty edge list; the distributed
    # path must label every doc as its own singleton, not crash in the
    # per-round join on a schema-less empty side
    docs = rd.from_pandas(pd.DataFrame({"doc_id": np.arange(7, dtype=np.int64)}))
    edges = rd.from_arrow(
        pa.table({"a": pa.array([], type=pa.int64()),
                  "b": pa.array([], type=pa.int64())})
    )
    out = assign_clusters_distributed(docs, edges, num_partitions=4).to_pandas()
    assert len(out) == 7
    assert (out["cluster_id"] == out["doc_id"]).all()
    assert not out["is_dup"].any()
def test_drop_empty_blocks_no_schema_raises(ray_session):
    # the materialized sort of an empty dataset has zero blocks and no
    # schema; without the caller fallback there is nothing to build
    from metacache_mpi_ray.functions.blocks import drop_empty_blocks

    empty = rd.from_arrow(
        pa.table({"x": pa.array([], type=pa.int64())})
    ).sort("x").materialize()
    if empty.schema() is not None:  # future Ray may fix this; then n/a
        pytest.skip("sort of empty dataset kept its schema")
    with pytest.raises(ValueError, match="pass the expected schema"):
        drop_empty_blocks(empty)


def test_ensure_columns():
    from metacache_mpi_ray.functions.blocks import ensure_columns

    full = pd.DataFrame({"a": [1], "b": [2]})
    assert ensure_columns(full, ["a", "b"]) is full
    empty = pd.DataFrame()
    out = ensure_columns(empty, ["a", "b"])
    assert list(out.columns) == ["a", "b"] and len(out) == 0

"""Distributed k-means + SemDeDup (stages/kmeans.py): agreement with a
driver-side numpy reference, partition invariance, planted-cluster
exactness, null handling."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from metacache_mpi_ray.stages.kmeans import (
    _assign_cells,
    cell_histogram,
    kmeans_assign,
    kmeans_fit,
    semantic_dedup,
)


def _emb_table(mat: np.ndarray, ids=None) -> pa.Table:
    n, d = mat.shape
    if ids is None:
        ids = np.arange(n, dtype=np.int64)
    return pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1), type=pa.float64()), d
            ),
        }
    )


def _planted(n=600, n_groups=24, d=8):
    ids = np.arange(n, dtype=np.int64)
    g = ids % n_groups
    mat = ((g[:, None] + np.arange(d)[None, :]) % 3).astype(np.float64)
    mat[np.arange(n), g % d] = 10.0
    return ids, g, mat


def test_assign_matches_numpy_and_breaks_ties_low():
    cent = np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0]])  # cells 0 and 2 identical
    mat = np.array([[2.0, 0.0], [0.0, 3.0], [1.0, 1.0]])
    ds = rd.from_arrow(_emb_table(mat))
    out = (
        kmeans_assign(ds, cent, metric="cos").to_pandas().sort_values("vec_id")
    )
    # row 0 ties between cells 0 and 2 -> lowest wins; row 2 ties across
    # all three (cos equal to cell 1 too? no: cos(1,1)@(0,1)=0.707 same
    # as (1,0) -> all equal) -> cell 0
    assert out["cell"].tolist() == [0, 1, 0]


@pytest.mark.parametrize("metric", ["cos", "l2"])
def test_fit_matches_driver_reference(metric):
    # well-separated planted data: distributed float-sum order can
    # differ from the serial reference in the last ulp, so boundary
    # points must not exist for exact assignment agreement
    _ids, _g, mat = _planted(n=400)
    ds = rd.from_arrow(_emb_table(mat)).repartition(4)
    k, iters = 5, 4
    cent = kmeans_fit(ds, k, iters=iters, seed=9, metric=metric)

    # driver-side reference with the SAME init (re-derive it)
    from metacache_mpi_ray.stages.kmeans import _fit_sample
    from metacache_mpi_ray.stages.ann import _normalize

    init = _fit_sample(ds, k, 9, 4096, "vec_id")
    if metric == "cos":
        init = _normalize(init)
    stride = max(1, len(init) // k)
    ref = init[::stride][:k].copy()
    work = _normalize(mat) if metric == "cos" else mat
    for _ in range(iters):
        a = _assign_cells(work, ref, metric)
        new = ref.copy()
        for c in range(k):
            m = a == c
            if m.any():
                if metric == "cos":
                    s = work[m].sum(axis=0)
                    nrm = np.linalg.norm(s)
                    if nrm > 0:
                        new[c] = s / nrm
                else:
                    new[c] = work[m].mean(axis=0)
        if np.array_equal(new, ref):
            break
        ref = new
    # same assignment everywhere (centroids may differ in last-ulp sum
    # order, so compare the induced clustering, not raw floats)
    got = _assign_cells(work, cent, metric)
    want = _assign_cells(work, ref, metric)
    assert (got == want).all()
    np.testing.assert_allclose(cent, ref, rtol=1e-9, atol=1e-12)


def test_fit_partition_invariant_and_coalesce_path():
    ids, g, mat = _planted()
    a = kmeans_fit(rd.from_arrow(_emb_table(mat)).repartition(2), 4, iters=3, seed=3)
    # combine_blocks=1 forces the pre-combine repartition pass
    b = kmeans_fit(
        rd.from_arrow(_emb_table(mat)).repartition(13),
        4,
        iters=3,
        seed=3,
        combine_blocks=1,
    )
    # same clustering from both (float sums may differ in last ulp
    # across block splits; the induced assignment must not)
    assert (
        _assign_cells(_norm(mat), a, "cos") == _assign_cells(_norm(mat), b, "cos")
    ).all()


def _norm(m):
    from metacache_mpi_ray.stages.ann import _normalize

    return _normalize(m)


def test_semantic_dedup_planted_exact():
    ids, g, mat = _planted()
    ds = rd.from_arrow(_emb_table(mat)).repartition(5)
    out = (
        semantic_dedup(ds, n_cells=4, sim_threshold=0.99, iters=5, seed=3)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    # identical vectors within each planted group -> cluster = min id of
    # the group = group index; every vec has >= 1 identical twin
    assert (out["cluster_id"].to_numpy() == g).all()
    assert out["is_dup"].all()
    assert list(out.columns) == ["vec_id", "cluster_id", "is_dup"]


def test_semantic_dedup_singletons_not_dup():
    # 4 far-apart directions, no duplicates
    mat = np.eye(4) * 7.0
    ds = rd.from_arrow(_emb_table(mat))
    out = semantic_dedup(ds, n_cells=2, sim_threshold=0.99, iters=2, seed=1).to_pandas()
    assert not out["is_dup"].any()
    assert (out["cluster_id"] == out["vec_id"]).all()


def test_null_embeddings_dropped():
    mat = np.eye(3)
    t = _emb_table(mat)
    d = 3
    null_row = pa.table(
        {
            "vec_id": pa.array([99], type=pa.int64()),
            "embedding": pa.array(
                [None], type=pa.list_(pa.float64(), d)
            ),
        }
    )
    ds = rd.from_arrow(pa.concat_tables([t.cast(null_row.schema), null_row]))
    cent = kmeans_fit(ds, 2, iters=2, seed=1)
    out = kmeans_assign(ds, cent).to_pandas()
    assert 99 not in set(out["vec_id"])
    hist = cell_histogram(kmeans_assign(ds, cent)).to_pandas()
    assert hist["n_vecs"].sum() == 3

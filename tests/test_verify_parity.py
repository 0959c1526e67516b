"""Broadcast/join multiplicity parity (r4 review finding).

The r4 surface deduped duplicate (a, b) edge rows only on the join
fallback (a side-effect of its shuffle-size pruning), so the auto
strategy switch changed OUTPUT MULTIPLICITY for non-pre-deduped inputs.
Round 5 hoists the distinct-pairs dedup in front of every strategy:
these tests feed DUPLICATED edges to both paths and require
byte-identical sorted output — one row per distinct surviving pair.
"""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from metacache_mpi_ray.config import DedupConfig


def _dup_edges(pairs: list[tuple[int, int]], times: int = 3):
    """Edge dataset repeating every pair ``times`` times across blocks."""
    a = np.array([p[0] for p in pairs] * times, dtype=np.int64)
    b = np.array([p[1] for p in pairs] * times, dtype=np.int64)
    return rd.from_arrow(
        pa.table({"a": pa.array(a), "b": pa.array(b)})
    ).repartition(3)


def _sorted_df(ds, value_col: str) -> pd.DataFrame:
    df = ds.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    df[value_col] = df[value_col].round(12)
    return df


def test_verify_pairs_payload_paths_identical_on_duplicated_edges():
    from metacache_mpi_ray.stages.verify import verify_pairs_payload

    rng = np.random.default_rng(11)
    n, d = 40, 8
    vecs = rng.normal(size=(n, d))
    vecs[1] = vecs[0] + 1e-9  # one genuinely near pair
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    table = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "emb": pa.array(list(vecs)),
            }
        )
    ).repartition(2)
    pairs = [(0, 1), (2, 3), (4, 5), (0, 7), (6, 9)]
    edges = _dup_edges(pairs, times=4)

    def extract(batch: pa.Table):
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        emb = np.stack(batch["emb"].to_numpy(zero_copy_only=False))
        return ids, emb

    def score(va: np.ndarray, vb: np.ndarray):
        sim = (va * vb).sum(axis=1)
        return sim, sim >= -2.0  # keep every pair: multiplicity is the test

    out = {}
    for strat in ("broadcast", "join"):
        out[strat] = _sorted_df(
            verify_pairs_payload(
                edges,
                table,
                id_col="doc_id",
                extract=extract,
                score=score,
                value_col="sim",
                payload_dtype=np.float64,
                strategy=strat,
                num_partitions=4,
            ),
            "sim",
        )
    pd.testing.assert_frame_equal(out["broadcast"], out["join"])
    # exactly ONE row per distinct input pair on both paths
    assert len(out["broadcast"]) == len(pairs)
    assert set(zip(out["broadcast"]["a"], out["broadcast"]["b"])) == set(pairs)


def test_verify_edges_paths_identical_on_duplicated_edges():
    from metacache_mpi_ray.stages.signatures import sig_to_arrow
    from metacache_mpi_ray.stages.verify import verify_edges

    cfg = DedupConfig(n_perms=16, n_bands=16, sim_threshold=0.1)
    rng = np.random.default_rng(5)
    n = 30
    sig_mat = rng.integers(0, 2**63, size=(n, cfg.n_perms)).astype(np.uint64)
    # every tested pair agrees on enough perms to clear the threshold
    for x, y in [(0, 1), (2, 3), (10, 11), (5, 20)]:
        sig_mat[y, :8] = sig_mat[x, :8]
    sig_mat[1] = sig_mat[0]  # one exact-duplicate signature pair
    sigs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "sig": sig_to_arrow(sig_mat),
            }
        )
    ).repartition(2)
    pairs = [(0, 1), (2, 3), (10, 11), (5, 20)]
    edges = _dup_edges(pairs, times=5)
    out = {
        strat: _sorted_df(
            verify_edges(edges, sigs, cfg, num_partitions=4, strategy=strat),
            "est_sim",
        )
        for strat in ("broadcast", "join")
    }
    pd.testing.assert_frame_equal(out["broadcast"], out["join"])
    assert len(out["broadcast"]) == len(pairs)


def test_exact_jaccard_paths_identical_on_duplicated_edges():
    from metacache_mpi_ray.stages.verify import verify_edges_exact_jaccard

    cfg = DedupConfig(shingle_k=3, sim_threshold=0.001)
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "the quick brown fox jumps over the lazy dog again and again",
        "a completely different document about ray data pipelines",
        "yet another unrelated string of words for the corpus here",
    ]
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "norm_text": pa.array(texts),  # shingle_sets reads norm_text
            }
        )
    )
    pairs = [(0, 1), (0, 2), (2, 3)]
    edges = _dup_edges(pairs, times=3)
    out = {
        strat: _sorted_df(
            verify_edges_exact_jaccard(edges, docs, cfg, strategy=strat,
                                       num_partitions=4),
            "jaccard",
        )
        for strat in ("broadcast", "join")
    }
    pd.testing.assert_frame_equal(out["broadcast"], out["join"])
    assert len(out["broadcast"]) == len(pairs)
    dup_row = out["broadcast"].set_index(["a", "b"]).loc[(0, 1)]
    assert dup_row["jaccard"] == pytest.approx(1.0)

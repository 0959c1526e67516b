"""Fixed-token-window chunking: exact agreement with a pure-Python
oracle, tiling invariants, edge cases, partition invariance."""
import numpy as np
import pyarrow as pa
import pytest
import ray

from metacache_mpi_ray.stages.chunking import chunk_documents, chunk_tokens_batch


def _oracle(ids, texts, k):
    rows = []
    for i, txt in zip(ids, texts):
        toks = txt.split(" ")  # keeps empties, '' -> ['']
        n = max(1, -(-len(toks) // k))
        for c in range(n):
            part = toks[c * k : (c + 1) * k]
            rows.append((i, c, len(part), " ".join(part)))
    return rows


@pytest.mark.parametrize("k", [1, 3, 50])
def test_chunk_batch_matches_oracle(k):
    rng = np.random.default_rng(11)
    texts = [
        " ".join(f"w{j}" for j in range(rng.integers(0, 130)))
        for _ in range(40)
    ]
    texts += ["", "single", "a  b", " lead", "trail "]
    ids = np.arange(len(texts), dtype=np.int64)
    t = pa.table({"doc_id": ids, "text": texts})
    out = chunk_tokens_batch(t, chunk_tokens=k)
    got = list(
        zip(
            out["doc_id"].to_pylist(),
            out["chunk_idx"].to_pylist(),
            out["n_tokens"].to_pylist(),
            out["chunk"].to_pylist(),
        )
    )
    assert got == _oracle(ids, texts, k)


def test_chunks_tile_the_document():
    texts = [" ".join(f"t{j}" for j in range(137)), "x y z"]
    t = pa.table({"doc_id": np.array([5, 9], dtype=np.int64), "text": texts})
    out = chunk_tokens_batch(t, chunk_tokens=50).to_pandas()
    # rejoining a doc's chunks in order reproduces the original text
    for i, txt in ((5, texts[0]), (9, texts[1])):
        sub = out[out.doc_id == i].sort_values("chunk_idx")
        assert " ".join(sub["chunk"]) == txt
        assert (sub["n_tokens"].iloc[:-1] == 50).all() or len(sub) == 1


def test_empty_batch_schema():
    t = pa.table(
        {"doc_id": pa.array([], type=pa.int64()), "text": pa.array([], type=pa.string())}
    )
    out = chunk_tokens_batch(t)
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "chunk_idx", "n_tokens", "chunk"]


@pytest.mark.parametrize("parallelism", [1, 6])
def test_dataset_wrapper_partition_invariant(parallelism):
    texts = [" ".join(f"v{i}_{j}" for j in range(i % 20)) for i in range(60)]
    ids = np.arange(60, dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table({"doc_id": ids, "text": texts})
    ).repartition(parallelism)
    out = chunk_documents(ds, chunk_tokens=7).to_pandas()
    out = out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    exp = _oracle(ids, texts, 7)
    assert len(out) == len(exp)
    assert list(zip(out.doc_id, out.chunk_idx, out.n_tokens, out.chunk)) == exp


@pytest.mark.parametrize("parallelism", [1, 5])
def test_pack_sequences_matches_prefix_sum(parallelism):
    from metacache_mpi_ray.stages.chunking import pack_sequences

    rng = np.random.default_rng(3)
    n = 80
    ids = np.arange(n, dtype=np.int64) * 3 + 1
    ntok = rng.integers(0, 40, size=n).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"doc_id": ids, "n_tokens": ntok})
    ).repartition(parallelism)
    out = (
        pack_sequences(ds, seq_len=16)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    run = np.cumsum(ntok)
    off = run - ntok
    first = off // 16
    last = np.where(ntok > 0, (run - 1) // 16, first)
    assert np.array_equal(out["tok_offset"].to_numpy(), off)
    assert np.array_equal(out["first_seq"].to_numpy(), first)
    assert np.array_equal(out["last_seq"].to_numpy(), last)
    assert np.array_equal(out["n_seqs"].to_numpy(), last - first + 1)


def test_count_tokens_batch():
    from metacache_mpi_ray.stages.chunking import count_tokens_batch

    t = pa.table({"doc_id": [1, 2, 3], "text": ["a b  c", "", "one"]})
    out = count_tokens_batch(t)
    assert out["n_tokens"].to_pylist() == [4, 1, 1]


def test_chunk_batch_large_string():
    texts = pa.array(["a b c d", "x"], type=pa.large_string())
    t = pa.table({"doc_id": np.array([1, 2], dtype=np.int64), "text": texts})
    out = chunk_tokens_batch(t, chunk_tokens=3)
    assert out["chunk"].to_pylist() == ["a b c", "d", "x"]
    assert out["n_tokens"].to_pylist() == [3, 1, 1]

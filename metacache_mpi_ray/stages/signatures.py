"""MinHash signature stage — the analog of the reference's sketcher.

Reference: per-window bottom-s sketch of canonical k-mer hashes
(/root/reference/src/hash_dna.h:104-152, k=16 / sketchlen=16,
mode_build.cpp:65-68). Here: per-document 128-permutation MinHash over
char-16-gram shingle hashes of norm-v1 text, computed fully vectorized
across the whole batch:

  1. concatenate all docs' bytes, hash every 16-byte window in one
     sliding-window pass (functions/hashing.concat_shingle_hashes);
  2. for each permutation p: vals = a_p * h + b_p (u64 wraparound),
     sig[:, p] = np.minimum.reduceat(vals, doc_offsets)  — one
     vectorized pass over ALL shingles in the batch per permutation.

Duplicate shingles need no dedup for plain min-hash (min over a
multiset equals min over its set), unlike the reference's bottom-s
sketch which must keep distinct values (hash_dna.h:130-137).

Stateful actor pool: permutation constants live in ``__init__`` (once
per actor), not per batch (SURVEY.md §2.3 T3).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from metacache_mpi_ray.config import DedupConfig
from metacache_mpi_ray.functions.hashing import (
    U64,
    concat_shingle_hashes,
    minhash_perm_constants,
)


def minhash_from_shingles(
    hashes: np.ndarray, offsets: np.ndarray, n_perms: int, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """Core kernel: per-doc shingle hash stream -> (ndocs, n_perms) u64
    signatures, one vectorized reduceat pass per permutation."""
    n = len(offsets) - 1
    sig = np.empty((n, n_perms), dtype=U64)
    if n == 0 or len(hashes) == 0:
        return sig
    starts = offsets[:-1]
    buf = np.empty_like(hashes)
    with np.errstate(over="ignore"):
        for p in range(n_perms):
            np.multiply(hashes, a[p], out=buf)
            np.add(buf, b[p], out=buf)
            sig[:, p] = np.minimum.reduceat(buf, starts)
    return sig


def oph_minhash_from_shingles(
    hashes: np.ndarray, offsets: np.ndarray, n_bins: int
) -> np.ndarray:
    """One-permutation hashing (Li, Owen, Zhang 2012) with rotation
    densification (Shrivastava & Li 2014): shingles land in
    ``n_bins`` bins by their top hash bits; the signature is the min
    hash value per bin, empty bins borrow circularly from the next
    filled bin. ONE O(M log M) pass over the shingle stream instead of
    n_perms passes — the at-scale scheme. Requires fmix-finalized
    (uniform) hashes; n_bins must be a power of two.
    """
    n = len(offsets) - 1
    shift = U64(64 - int(n_bins).bit_length() + 1)
    sig = np.full((n, n_bins), np.iinfo(np.uint64).max, dtype=U64)
    if n == 0 or len(hashes) == 0:
        return sig
    counts = np.diff(offsets)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    bins = (hashes >> shift).astype(np.int64)
    key = doc_idx * n_bins + bins
    np.minimum.at(sig.reshape(-1), key, hashes)  # vectorized scatter-min
    # rotation densification: empty bin j takes the value of the next
    # filled bin to its left, circularly (two ffill sweeps over columns)
    SENT = np.iinfo(np.uint64).max
    for _sweep in range(2):
        prev = sig[:, -1].copy()
        for j in range(n_bins):
            col = sig[:, j]
            empty = col == SENT
            if empty.any():
                col[empty] = prev[empty]
            prev = col
    return sig


def minhash_matrix(
    texts: list[bytes], cfg: DedupConfig, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """(ndocs, n_perms) u64 signature matrix for a batch of documents
    (list-of-bytes reference path; the hot path feeds Arrow buffers to
    the same kernels — both produce identical values)."""
    if len(texts) == 0:
        return np.empty((0, cfg.n_perms), dtype=U64)
    if cfg.minhash_scheme == "oph":
        hashes, offsets = concat_shingle_hashes(texts, cfg.shingle_k, cfg.seed)
        return oph_minhash_from_shingles(hashes, offsets, cfg.n_perms)
    # fmix finalization skipped: the (a*h+b) permutations are the
    # dispersal step, and fmix is a bijection (same Jaccard structure)
    hashes, offsets = concat_shingle_hashes(
        texts, cfg.shingle_k, cfg.seed, finalize=False
    )
    return minhash_from_shingles(hashes, offsets, cfg.n_perms, a, b)


_MODP = 1_000_000_007


def modp_perm_constants(n_perms: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Small affine-permutation constants a in [1, p-1], b in [0, p-1]
    for the SQL-reproducible mod-p MinHash variant. Derived from the
    same splitmix64 stream as the production u64 permutations so the
    DuckDB oracle can embed them as literals (int64)."""
    a64, b64 = minhash_perm_constants(n_perms, seed)
    a = (a64 % U64(_MODP - 1)).astype(np.int64) + 1
    b = (b64 % U64(_MODP)).astype(np.int64)
    return a, b


def token_modp_signature_batch(
    batch: pa.Table, n_perms: int = 16, seed: int = 0
) -> pa.Table:
    """SQL-exact MinHash signatures over whitespace tokens: tokens =
    split(text, ' ') (empty tokens kept, matching DuckDB string_split),
    token hash = polynomial hash mod p (base 131), signature value =
    min over tokens of (a_i * x + b_i) — NO modulus on the affine step,
    so a_i, x < p ~ 2^30 keeps every product < 2^60: the exact same
    ``minhash_from_shingles`` kernel the flagship signer uses runs it
    with zero u64 wraparound, and DuckDB reproduces it in BIGINT.
    Output rows (doc_id, perm_id, min_hash) — the signature matrix
    exploded for order-insensitive value hashing."""
    import pyarrow.compute as pc

    from metacache_mpi_ray.functions.hashing import arrow_string_buffer
    from metacache_mpi_ray.stages.textstats import modp_poly_hash

    toks = pc.split_pattern(batch["text"], " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.flatten()
    data, starts, ends = arrow_string_buffer(flat)
    token_hashes = modp_poly_hash(data, starts, ends).astype(U64)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    a, b = modp_perm_constants(n_perms, seed)
    sig = minhash_from_shingles(
        token_hashes, offsets, n_perms, a.astype(U64), b.astype(U64)
    )
    n = len(counts)
    doc_ids = np.repeat(
        batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64), n_perms
    )
    perm_ids = np.tile(np.arange(n_perms, dtype=np.int64), n)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "perm_id": pa.array(perm_ids, type=pa.int64()),
            "min_hash": pa.array(sig.reshape(-1).astype(np.int64), type=pa.int64()),
        }
    )


def sig_to_arrow(sig: np.ndarray) -> pa.FixedSizeListArray:
    """(n, P) u64 matrix -> fixed_size_list<uint64, P> column (zero-copy)."""
    n, p = sig.shape
    return pa.FixedSizeListArray.from_arrays(pa.array(sig.reshape(-1)), p)


def sig_to_binary(sig: np.ndarray) -> pa.Array:
    """(n, P) u64 matrix -> binary column of n x P*8-byte rows.

    Arrow's hash join (acero) cannot carry list-typed payload columns,
    so signatures ride through the verification joins as packed bytes.
    """
    n, p = sig.shape
    flat = np.ascontiguousarray(sig).view(np.uint8).reshape(-1)
    offsets = (np.arange(n + 1, dtype=np.int32) * (p * 8))
    return pa.Array.from_buffers(
        pa.binary(), n, [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(flat.tobytes())]
    )


def sig_from_binary(col: pa.Array | pa.ChunkedArray, n_perms: int) -> np.ndarray:
    """binary column of packed signatures -> (n, P) u64 matrix."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, n_perms), dtype=U64)
    L = n_perms * 8
    offs = np.frombuffer(col.buffers()[1], dtype=np.int32)[col.offset : col.offset + n + 1]
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    idx = offs[:-1, None].astype(np.int64) + np.arange(L, dtype=np.int64)[None, :]
    rows = np.ascontiguousarray(data[idx])
    return rows.view(U64).reshape(n, n_perms)


def sig_from_arrow(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """fixed_size_list<uint64, P> column -> (n, P) u64 matrix."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    p = col.type.list_size
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return np.ascontiguousarray(flat).reshape(-1, p).astype(U64, copy=False)


class MinHashSigner:
    """Actor-pool stage: docs batch -> (doc_id, text_hash, n_chars, sig).

    Permutation constants are derived once per actor from cfg.seed, so
    every actor produces identical signatures for identical text
    (determinism invariant, SURVEY.md §2.9).
    """

    def __init__(self, cfg: DedupConfig | None = None):
        self.cfg = cfg or DedupConfig()
        self.a, self.b = minhash_perm_constants(self.cfg.n_perms, self.cfg.seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from metacache_mpi_ray.functions.hashing import (
            arrow_string_buffer,
            shingle_hashes_from_buffer,
        )

        # zero-copy: hash straight out of the Arrow string buffer
        data, starts, ends = arrow_string_buffer(batch["norm_text"])
        if self.cfg.minhash_scheme == "oph":
            hashes, offsets = shingle_hashes_from_buffer(
                data, starts, ends, self.cfg.shingle_k, self.cfg.seed
            )
            sig = oph_minhash_from_shingles(hashes, offsets, self.cfg.n_perms)
        else:
            hashes, offsets = shingle_hashes_from_buffer(
                data, starts, ends, self.cfg.shingle_k, self.cfg.seed, finalize=False
            )
            sig = minhash_from_shingles(
                hashes, offsets, self.cfg.n_perms, self.a, self.b
            )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "text_hash": batch["text_hash"],
                "n_chars": batch["n_chars"],
                "sig": sig_to_arrow(sig),
            }
        )


def compute_signatures(
    docs,
    cfg: DedupConfig,
    *,
    concurrency: int | None = None,
    batch_size: int = 4096,
    mode: str = "tasks",
):
    """docs -> signatures dataset.

    ``mode="tasks"`` (default): the signer state (permutation constants,
    ~2 KB) is built once on the driver and shipped inside the pickled
    callable; the stage runs on the elastic task pool, reusing the warm
    worker processes of the read stage. Right for cheap state.

    ``mode="actors"``: a stateful actor pool (state built per actor in
    __init__). Right for heavy state (models, big lookup tables) — but
    every Dataset execution pays a cold python process start per actor,
    which at pool size ~30 costs more than this stage's entire compute.
    Pool size defaults to (cluster CPUs - 2) so reads/shuffles keep
    CPUs (a pool sized to the whole node deadlocks the streaming
    executor)."""
    if mode == "tasks":
        return docs.map_batches(
            MinHashSigner(cfg), batch_format="pyarrow", batch_size=batch_size
        )
    from metacache_mpi_ray.functions.resources import default_actor_concurrency

    if concurrency is None:
        concurrency = default_actor_concurrency(reserve=2)
    return docs.map_batches(
        MinHashSigner,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=batch_size,
        num_cpus=1,
        concurrency=concurrency,
    )

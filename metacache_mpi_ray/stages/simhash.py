"""SimHash near-duplicate detection — the alternate sketch family.

64-bit SimHash over char-shingle hashes: each shingle votes its bit
pattern (+1/-1 per bit); the sign of the summed votes is the signature.
Near-dups are pairs within ``simhash_hamming`` bits; candidate
generation splits the 64 bits into (hamming+1) blocks — any pair within
distance h must agree exactly on at least one block (pigeonhole), so a
groupby per block finds all candidates, mirroring the LSH-band shuffle.

Fully vectorized: votes accumulate via np.add.reduceat over the
batch-concatenated shingle stream (same layout trick as MinHash).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from metacache_mpi_ray.config import DedupConfig
from metacache_mpi_ray.functions.hashing import U64, concat_shingle_hashes
from metacache_mpi_ray.stages.candidates import bucket_all_pairs, dedupe_edges


def simhash_from_shingles(hashes: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Core kernel: per-doc shingle stream -> (n,) u64 simhash.

    One unpackbits to an (M, 64) bit matrix + ONE axis-0 reduceat votes
    all 64 bits simultaneously (the round-1 version ran 64 separate
    shift+reduceat passes over the hash stream). bitorder='little'
    makes column k exactly bit k of the little-endian u64, so packbits
    reassembles the identical signature values."""
    n = len(offsets) - 1
    if n == 0 or len(hashes) == 0:
        return np.zeros(n, dtype=U64)
    starts = offsets[:-1]
    counts = np.diff(offsets)[:, None]
    bits = np.unpackbits(
        hashes.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    )
    # accumulate in int64 without materializing an int64 bit matrix
    ones = np.add.reduceat(bits, starts, axis=0, dtype=np.int64)
    votes = (2 * ones) > counts
    return np.packbits(votes, axis=1, bitorder="little").view(U64).reshape(-1)


def _simhash_from_shingles_ref(hashes: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Round-1 reference kernel (64 shift+reduceat passes) kept for the
    value-parity test — signatures must stay bit-identical."""
    n = len(offsets) - 1
    out = np.zeros(n, dtype=U64)
    if n == 0 or len(hashes) == 0:
        return out
    starts = offsets[:-1]
    counts = np.diff(offsets)
    for j in range(64):
        ones = np.add.reduceat(((hashes >> U64(j)) & U64(1)).astype(np.int64), starts)
        out |= ((2 * ones > counts).astype(U64) << U64(j))
    return out


def simhash_matrix(texts: list[bytes], cfg: DedupConfig) -> np.ndarray:
    """(n,) u64 simhash per document (list-of-bytes reference path)."""
    if len(texts) == 0:
        return np.zeros(0, dtype=U64)
    hashes, offsets = concat_shingle_hashes(texts, cfg.shingle_k, cfg.seed)
    return simhash_from_shingles(hashes, offsets)


def hamming_distance_u64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (a ^ b).view(np.uint8).reshape(len(a), 8)
    return np.unpackbits(x, axis=1).sum(axis=1).astype(np.int64)


class SimHasher:
    """Actor-pool stage: docs -> (doc_id, simhash)."""

    def __init__(self, cfg: DedupConfig | None = None):
        self.cfg = cfg or DedupConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from metacache_mpi_ray.functions.hashing import (
            arrow_string_buffer,
            shingle_hashes_from_buffer,
        )

        data, starts, ends = arrow_string_buffer(batch["norm_text"])
        hashes, offsets = shingle_hashes_from_buffer(
            data, starts, ends, self.cfg.shingle_k, self.cfg.seed
        )
        sh = simhash_from_shingles(hashes, offsets)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                # bit-preserving reinterpret u64 -> i64 (SQL/Arrow friendly)
                "simhash": pa.array(sh.view(np.int64), type=pa.int64()),
            }
        )


def simhash_block_rows(cfg: DedupConfig):
    """simhashes -> (block_id, block_val, doc_id, simhash) rows, one per
    bit-block (pigeonhole candidate key)."""
    n_blocks = cfg.simhash_hamming + 1
    width = 64 // n_blocks

    def emit(batch: pa.Table) -> pa.Table:
        sh = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        n = len(sh)
        blocks = []
        for j in range(n_blocks):
            shift = np.uint64(j * width)
            mask = np.uint64((1 << width) - 1)
            blocks.append(((sh >> shift) & mask).astype(np.int64))
        block_val = np.concatenate(blocks)
        return pa.table(
            {
                "block_id": pa.array(np.repeat(np.arange(n_blocks, dtype=np.int64), n)),
                "block_val": pa.array(block_val),
                "doc_id": pa.array(np.tile(batch["doc_id"].to_numpy(zero_copy_only=False), n_blocks)),
            }
        )

    return emit


def simhash_dedup(
    docs,
    cfg: DedupConfig | None = None,
    *,
    num_partitions: int = 16,
    verify_strategy: str = "auto",
):
    """docs -> candidate edges within simhash Hamming distance, verified
    exactly (Hamming check on the full 64-bit signatures via join)."""
    from metacache_mpi_ray.config import DedupConfig as _C

    from metacache_mpi_ray.functions.resources import default_actor_concurrency

    cfg = cfg or _C()
    sims = docs.map_batches(
        SimHasher, fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow", batch_size=4096,
        concurrency=default_actor_concurrency(reserve=2), num_cpus=1,
    ).materialize()
    blocks = sims.map_batches(simhash_block_rows(cfg), batch_format="pyarrow")
    # pair-LISTING semantics: all pairs per pigeonhole bucket (a star
    # edge set would miss (v, w) pairs hiding behind a dissimilar
    # bucket-mate with a smaller id)
    edges = bucket_all_pairs(
        blocks, key_cols=["block_id", "block_val"], id_col="doc_id",
        cap=cfg.bucket_cap,
    )
    edges = dedupe_edges(edges, num_partitions=num_partitions).materialize()

    # exact Hamming verification through the shared payload-sized
    # broadcast-vs-join auto switch (stages/verify.verify_pairs_payload):
    # broadcast the edge-endpoint simhashes while the dup subset fits in
    # one object, hash-join the packed values past that — the same scale
    # story as the flagship's signature verification
    from metacache_mpi_ray.stages.verify import verify_pairs_payload

    hmax = cfg.simhash_hamming

    def extract(batch: pa.Table):
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = (
            batch["simhash"].to_numpy(zero_copy_only=False)
            .astype(np.int64).view(U64).reshape(-1, 1)
        )
        return ids, vals

    def score(va: np.ndarray, vb: np.ndarray):
        d = hamming_distance_u64(va[:, 0], vb[:, 0])
        return d, d <= hmax

    return verify_pairs_payload(
        edges,
        sims,
        id_col="doc_id",
        extract=extract,
        score=score,
        value_col="hamming",
        value_type=pa.int64(),
        payload_dtype=U64,
        payload_bytes_per_row=8,
        strategy=verify_strategy,
        num_partitions=num_partitions,
    )

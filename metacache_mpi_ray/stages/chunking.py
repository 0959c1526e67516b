"""Fixed-token-window document chunking (training-data shaping).

Splits each document into consecutive windows of ``chunk_tokens``
whitespace tokens — the context-window shaping step an LLM training
pipeline runs after cleaning/dedup. The reference's structural analog
is ``for_each_window`` (/root/reference/src/dna_encoding.h:261-289):
fixed-length windows over a sequence, tail window included.

Scale shape: a pure 1→N vectorized flat-map inside ``map_batches`` —
no shuffle, no Python per row. The token split, the chunk re-grouping
and the chunk re-join all stay inside Arrow:

- ``pc.split_pattern`` tokenizes every row at once into one ListArray;
- chunk boundaries are pure offset arithmetic on that array's buffers
  (consecutive chunks tile the flattened token values exactly, so the
  chunked ListArray is rebuilt zero-copy from new offsets over the
  SAME values buffer);
- ``pc.binary_join`` materializes chunk strings in one kernel.

Token semantics match SQL exactly (split on single space, empty
tokens kept), so the operator is DuckDB-oracle-checkable via
``string_split`` + ``generate_series`` + list slicing.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def chunk_tokens_batch(
    t: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 50,
) -> pa.Table:
    """One batch of documents → one row per chunk.

    Output: ``(doc_id, chunk_idx, n_tokens, chunk)``. Every document
    yields at least one chunk (``split('')`` is one empty token, like
    SQL's ``string_split``); the tail chunk may be short.
    """
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    col = t[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks = pc.split_pattern(col, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = np.asarray(toks.offsets)
    n_tok = np.diff(offs)
    n_rows = len(n_tok)
    ids = t[id_col].to_numpy(zero_copy_only=False)
    if n_rows == 0:
        return pa.table(
            {
                id_col: pa.array([], type=t.schema.field(id_col).type),
                "chunk_idx": pa.array([], type=pa.int64()),
                "n_tokens": pa.array([], type=pa.int64()),
                "chunk": pa.array([], type=pa.string()),
            }
        )
    k = chunk_tokens
    n_chunks = np.maximum(1, -(-n_tok // k))  # ceil; >=1 even for empty
    doc_of = np.repeat(np.arange(n_rows), n_chunks)
    chunk_idx = np.arange(len(doc_of)) - np.repeat(
        np.concatenate([[0], np.cumsum(n_chunks)[:-1]]), n_chunks
    )
    starts = offs[doc_of] + chunk_idx * k
    ends = np.minimum(starts + k, offs[doc_of + 1])
    # consecutive chunks tile the flattened token values exactly, so
    # the chunked list array reuses toks' values buffer zero-copy
    new_offsets = np.concatenate([starts, offs[-1:]])
    if isinstance(toks, pa.LargeListArray):
        chunks = pa.LargeListArray.from_arrays(
            pa.array(new_offsets, type=pa.int64()), toks.values
        )
    else:
        chunks = pa.ListArray.from_arrays(
            pa.array(new_offsets, type=pa.int32()), toks.values
        )
    sep = pa.scalar(" ", type=chunks.type.value_type)
    joined = pc.binary_join(chunks, sep)
    return pa.table(
        {
            id_col: pa.array(ids[doc_of], type=t.schema.field(id_col).type),
            "chunk_idx": pa.array(chunk_idx, type=pa.int64()),
            "n_tokens": pa.array(ends - starts, type=pa.int64()),
            "chunk": joined,
        }
    )


def chunk_documents(ds, text_col="text", id_col="doc_id", chunk_tokens=50):
    """Dataset-level wrapper: streaming flat-map, no shuffle."""
    return ds.map_batches(
        lambda t: chunk_tokens_batch(
            t, text_col=text_col, id_col=id_col, chunk_tokens=chunk_tokens
        ),
        batch_format="pyarrow",
    )


def count_tokens_batch(
    t: pa.Table, text_col: str = "text", out_col: str = "n_tokens"
) -> pa.Table:
    """Whitespace token count straight from the split ListArray's
    offset buffer (no string materialization)."""
    col = t[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks = pc.split_pattern(col, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    n = np.diff(np.asarray(toks.offsets)).astype(np.int64)
    return t.append_column(out_col, pa.array(n, type=pa.int64()))


def pack_sequences(
    ds,
    seq_len: int,
    id_col: str = "doc_id",
    ntok_col: str = "n_tokens",
):
    """Concatenate-and-split sequence packing (the standard LLM
    pretraining layout: every document's tokens land at a global
    offset in one virtual stream, which is then cut into fixed
    ``seq_len`` windows).

    Deterministic and partition-invariant: the global offset is an
    exclusive prefix sum over ``id_col`` order computed by the
    distributed scan (stages/scan.py — per-block partial sums + one
    small carry exchange, no driver-side pass). Output per document:
    ``tok_offset``, ``first_seq``/``last_seq`` (the training sequences
    the document spans) and ``n_seqs``.
    """
    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")
    from metacache_mpi_ray.stages.scan import cumsum_per_group

    def add_g(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_g", pa.array(np.zeros(len(t), dtype=np.int64))
        )

    run = cumsum_per_group(
        ds.map_batches(add_g, batch_format="pyarrow"),
        ["_g"],
        [id_col],
        ntok_col,
        out_col="_run",
    )

    def finish(t: pa.Table) -> pa.Table:
        r = t["_run"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t[ntok_col].to_numpy(zero_copy_only=False).astype(np.int64)
        off = r - n
        first = off // seq_len
        # empty docs (n == 0) sit entirely at their offset
        last = np.where(n > 0, (r - 1) // seq_len, first)
        return pa.table(
            {
                id_col: t[id_col],
                "tok_offset": pa.array(off, type=pa.int64()),
                "first_seq": pa.array(first, type=pa.int64()),
                "last_seq": pa.array(last, type=pa.int64()),
                "n_seqs": pa.array(last - first + 1, type=pa.int64()),
            }
        )

    return run.map_batches(finish, batch_format="pyarrow")

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
    joined = pc.binary_join(chunks, " ")
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

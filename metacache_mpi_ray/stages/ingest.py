"""Ingest: pages/documents Parquet -> canonical ``docs`` dataset.

Canonical docs schema:
    doc_id:int64  (given, or stable 63-bit hash of url)
    url:string
    norm_text:string  (norm-v1 of resolved text)
    text_hash:int64   (stable hash of norm_text bytes)
    n_chars:int64     (len of norm_text)

Analog of the reference's FASTA/FASTQ reader + target registration
(/root/reference/src/sequence_io.cpp:100-221,
/root/reference/src/sketch_database.h:489-563) — but as a stateless
Arrow map_batches over a Parquet read, with ids derived from content
keys (url), never from arrival order (SURVEY.md §2.9 determinism note).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from metacache_mpi_ray.functions.hashing import (
    arrow_string_buffer,
    doc_hashes_from_buffer,
)
from metacache_mpi_ray.functions.text import resolve_text_batch


def _to_i63(u64: np.ndarray) -> np.ndarray:
    """Mask a u64 hash to a non-negative int64 (SQL/Arrow friendly)."""
    return (u64 >> np.uint64(1)).astype(np.int64)


def _col_hash_i63(col, seed: int) -> np.ndarray:
    """Stable 63-bit content hash of an Arrow string column, zero-copy."""
    data, starts, ends = arrow_string_buffer(col)
    return _to_i63(doc_hashes_from_buffer(data, starts, ends, seed))


def _ingest_pages_batch(batch: pa.Table, canonicalize_urls: bool = False) -> pa.Table:
    batch = resolve_text_batch(batch)
    norm = batch["norm_text"]
    url = batch["url"]
    if canonicalize_urls:
        # URL variants of the same page collapse to one doc key (M6
        # analog of the reference's accession normalization)
        from metacache_mpi_ray.functions.urls import canonicalize_url_arrow

        if isinstance(url, pa.ChunkedArray):
            url = url.combine_chunks()
        url = canonicalize_url_arrow(url)
    return pa.table(
        {
            "doc_id": pa.array(_col_hash_i63(url, seed=11), type=pa.int64()),
            "url": url,
            "norm_text": norm,
            "text_hash": pa.array(_col_hash_i63(norm, seed=22), type=pa.int64()),
            "n_chars": pc.utf8_length(norm).cast(pa.int64()),
        }
    )


def _ingest_documents_batch(batch: pa.Table) -> pa.Table:
    """Adapter for the driver's ``documents`` table (doc_id given)."""
    from metacache_mpi_ray.functions.text import normalize_text_arrow

    norm = normalize_text_arrow(batch["text"])
    if isinstance(norm, pa.ChunkedArray):
        norm = norm.combine_chunks()
    return pa.table(
        {
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "url": pc.cast(batch["doc_id"], pa.string()),
            "norm_text": norm,
            "text_hash": pa.array(_col_hash_i63(norm, seed=22), type=pa.int64()),
            "n_chars": pc.utf8_length(norm).cast(pa.int64()),
        }
    )


def ingest_pages(
    pages: "ray.data.Dataset", *, canonicalize_urls: bool = False
) -> "ray.data.Dataset":
    """pages(url, warc_ts, html, text, lang) -> docs."""
    import functools

    fn = functools.partial(_ingest_pages_batch, canonicalize_urls=canonicalize_urls)
    return pages.map_batches(fn, batch_format="pyarrow")


def ingest_documents(documents: "ray.data.Dataset") -> "ray.data.Dataset":
    """documents(doc_id, text, ...) -> docs (driver testdata adapter)."""
    return documents.map_batches(_ingest_documents_batch, batch_format="pyarrow")


def read_docs(sf_dir: str, table: str = "documents") -> "ray.data.Dataset":
    """Column-pruned read of a testdata table into canonical docs."""
    if table == "documents":
        ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        return ingest_documents(ds)
    raise ValueError(f"unknown docs table {table!r}")

"""Raw-format streaming ingest: HTML files -> canonical docs (S1 raw
path). The reference streams raw FASTA/FASTQ straight from disk
(/root/reference/src/sequence_io.cpp:100-221); the web analog is
``ray.data.read_binary_files`` over a directory of HTML payloads, with
text extraction and canonicalization as the same vectorized Arrow
map_batches the parquet path uses — one code path for both sources.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from metacache_mpi_ray.stages.ingest import ingest_pages


def read_html_files(
    paths: str | list[str],
    *,
    canonicalize_urls: bool = True,
) -> "ray.data.Dataset":
    """Directory (or list) of raw .html files -> canonical docs dataset.

    Each file becomes one page: url = file://<path>, html = the raw
    bytes, text = null (forcing the vectorized HTML->text extractor).
    """
    raw = ray.data.read_binary_files(paths, include_paths=True)

    def to_pages(t: pa.Table) -> pa.Table:
        paths_col = t["path"]
        url = pa.compute.binary_join_element_wise(
            pa.scalar("file://"), paths_col.cast(pa.string()), ""
        )
        n = len(t)
        return pa.table(
            {
                "url": url,
                "html": t["bytes"].cast(pa.binary()),
                "text": pa.array([None] * n, type=pa.string()),
            }
        )

    pages = raw.map_batches(to_pages, batch_format="pyarrow")
    return ingest_pages(pages, canonicalize_urls=canonicalize_urls)

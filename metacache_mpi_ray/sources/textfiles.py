"""Delimited and JSON-lines source formats -> canonical docs.

The reference ingests several on-disk record formats through one
streaming reader family with format dispatch
(/root/reference/src/sequence_io.cpp:534-571 make_sequence_reader;
FASTA 100-221, FASTQ 229-327). The engine's analogs: Parquet
(stages/ingest.py), raw HTML files (sources/rawhtml.py), and — here —
CSV and NDJSON/JSONL corpora, all converging on the SAME canonical
docs schema (doc_id, url, norm_text, text_hash, n_chars) so every
downstream stage is format-agnostic, mirroring how the reference's
readers all emit one ``{index, header, data}`` record shape.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from metacache_mpi_ray.stages.ingest import ingest_documents


def _prep(id_col: str, text_col: str):
    def f(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t[id_col].cast(pa.int64()),
                "text": pc.cast(t[text_col], pa.string()),
            }
        )

    return f


def read_docs_csv(
    paths: str | list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    **read_kw,
) -> "ray.data.Dataset":
    """CSV file(s)/dir with at least (id_col, text_col) -> canonical
    docs. Quoted fields (commas/newlines inside text) round-trip via
    the Arrow CSV reader; extra columns are dropped at the read.

    The column types are pinned rather than inferred: an all-numeric-
    looking text column ('007', '1e5', 'TRUE') would otherwise be
    inferred as int/double/bool and silently re-rendered by the string
    cast, diverging from the same corpus ingested via Parquet/JSONL.
    Unquoted empty fields read back as NULL (parquet-null parity) while
    quoted empty strings stay '' — the Arrow writer quotes real strings,
    so null/'' round-trips exactly."""
    import pyarrow.csv as pacsv

    if "convert_options" not in read_kw:
        read_kw["convert_options"] = pacsv.ConvertOptions(
            column_types={id_col: pa.int64(), text_col: pa.string()},
            strings_can_be_null=True,
            quoted_strings_can_be_null=False,
        )
    ds = ray.data.read_csv(paths, **read_kw)
    return ingest_documents(ds.map_batches(_prep(id_col, text_col), batch_format="pyarrow"))


def read_docs_jsonl(
    paths: str | list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    **read_kw,
) -> "ray.data.Dataset":
    """NDJSON / JSON-lines file(s)/dir (one JSON object per line, the
    common web-corpus interchange layout) -> canonical docs."""
    ds = ray.data.read_json(paths, **read_kw)
    return ingest_documents(ds.map_batches(_prep(id_col, text_col), batch_format="pyarrow"))

"""CSV / JSONL source readers must produce byte-identical canonical
docs to the Parquet ingest path (S1-S5 format-dispatch parity: every
reader converges on one record shape, sequence_io.cpp:534-571)."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_frames(tmp_path_factory):
    tab = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    d = tmp_path_factory.mktemp("textfiles")
    csv_path = os.path.join(d, "docs.csv")
    jsonl_path = os.path.join(d, "docs.jsonl")
    import pyarrow.csv as pacsv

    pacsv.write_csv(tab, csv_path)
    tab.to_pandas().to_json(jsonl_path, orient="records", lines=True)
    return csv_path, jsonl_path


def _canon(ds) -> pd.DataFrame:
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_csv_and_jsonl_match_parquet_ingest(docs_frames):
    from metacache_mpi_ray.sources.textfiles import read_docs_csv, read_docs_jsonl
    from metacache_mpi_ray.stages.ingest import read_docs

    csv_path, jsonl_path = docs_frames
    want = _canon(read_docs(SF))
    got_csv = _canon(read_docs_csv(csv_path))
    got_jsonl = _canon(read_docs_jsonl(jsonl_path))
    pd.testing.assert_frame_equal(got_csv, want)
    pd.testing.assert_frame_equal(got_jsonl, want)


def test_csv_quoting_roundtrip(tmp_path):
    """Commas, quotes and newlines inside text survive the CSV reader."""
    from metacache_mpi_ray.sources.textfiles import read_docs_csv

    texts = ['a, "quoted" b', "line1\nline2", "plain"]
    tab = pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                    "text": pa.array(texts)})
    import pyarrow.csv as pacsv

    p = os.path.join(tmp_path, "q.csv")
    pacsv.write_csv(tab, p)
    got = read_docs_csv(p).to_pandas().sort_values("doc_id")
    # norm-v1 collapses the newline to one space
    assert got["norm_text"].tolist() == ['a, "quoted" b', "line1 line2", "plain"]


def test_csv_nulls_and_inference_prone_values(tmp_path):
    """NULL vs '' and numeric/bool-looking text must round-trip exactly
    (pinned column types + quoted-empty-vs-unquoted-null semantics) —
    byte parity with the in-memory ingest of the same table."""
    from metacache_mpi_ray.sources.textfiles import read_docs_csv
    from metacache_mpi_ray.stages.ingest import ingest_documents

    tab = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
            "text": pa.array(["x", None, "", "007", "1e5", "TRUE"]),
        }
    )
    import pyarrow.csv as pacsv

    p = os.path.join(tmp_path, "n.csv")
    pacsv.write_csv(tab, p)
    got = _canon(read_docs_csv(p))
    want = _canon(ingest_documents(rd.from_arrow(tab)))
    pd.testing.assert_frame_equal(got, want)


def test_custom_column_names(tmp_path):
    from metacache_mpi_ray.sources.textfiles import read_docs_jsonl

    df = pd.DataFrame({"id": [10, 11], "body": ["X  Y", " z "]})
    p = os.path.join(tmp_path, "c.jsonl")
    df.to_json(p, orient="records", lines=True)
    got = (
        read_docs_jsonl(p, id_col="id", text_col="body")
        .to_pandas()
        .sort_values("doc_id")
    )
    assert got["doc_id"].tolist() == [10, 11]
    assert got["norm_text"].tolist() == ["x y", "z"]

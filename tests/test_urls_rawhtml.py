"""URL canonicalization + vectorized HTML extraction + raw-file ingest."""

import pyarrow as pa
import pytest


def test_canonicalize_url_arrow():
    from metacache_mpi_ray.functions.urls import canonicalize_url_arrow

    urls = [
        "HTTPS://Site3.Example.COM:443/Path/77?utm_source=feed&id=77&utm_campaign=x#frag",
        "http://Host.org:80/a?utm_a=1&utm_b=2&x=3",
        "https://h.io/p?utm_only=1",
        "https://h.io/p?a=1&fbclid=zz",
        "no-scheme/path?gclid=1",
        "https://h.io:8443/keep-port?x=1",
    ]
    got = canonicalize_url_arrow(pa.array(urls)).to_pylist()
    assert got == [
        "https://site3.example.com/Path/77?id=77",
        "http://host.org/a?x=3",
        "https://h.io/p",
        "https://h.io/p?a=1",
        "no-scheme/path",
        "https://h.io:8443/keep-port?x=1",
    ]


def test_vectorized_extractor_matches_per_row():
    """The Arrow kernel chain must agree byte-for-byte with the per-row
    reference extractor (the ingest determinism invariant)."""
    from metacache_mpi_ray.functions.text import (
        extract_text_from_html,
        extract_text_html_arrow,
    )

    htmls = [
        b"<html><head><script>var x=1;</script><style>p{}</style></head>"
        b"<body><p>Hello &amp; welcome</p><!-- c --></body></html>",
        b"<div>a\n\n  b\tc</div>",
        b"plain text no tags",
        b"<SCRIPT a=b>nested < tags</SCRIPT><p>kept</p>",
        b"&lt;escaped&gt; &quot;q&quot; &#39;s&#39; &nbsp;end",
    ]
    per_row = [extract_text_from_html(h) for h in htmls]
    vec = extract_text_html_arrow(
        pa.array([h.decode() for h in htmls], type=pa.string())
    ).to_pylist()
    assert vec == per_row


def test_read_html_files_roundtrip(tmp_path):
    from metacache_mpi_ray.sources.rawhtml import read_html_files

    texts = ["alpha beta gamma", "delta epsilon", "zeta eta theta iota"]
    for i, t in enumerate(texts):
        (tmp_path / f"page{i}.html").write_text(
            f"<html><head><script>x=1;</script></head><body><h1>{t}</h1>"
            f"<!-- comment --></body></html>"
        )
    docs = read_html_files(str(tmp_path)).to_pandas()
    assert len(docs) == 3
    assert sorted(docs["norm_text"]) == sorted(texts)
    # ids are stable content keys of the (canonicalized) file url
    docs2 = read_html_files(str(tmp_path)).to_pandas()
    assert set(docs["doc_id"]) == set(docs2["doc_id"])


def test_ingest_pages_url_canonicalization_collapses_variants():
    import ray.data as rd

    from metacache_mpi_ray.stages.ingest import ingest_pages

    pages = pa.table(
        {
            "url": pa.array(
                [
                    "https://a.io/p?utm_source=x",
                    "HTTPS://A.IO/p",
                    "https://a.io/other",
                ]
            ),
            "html": pa.array([None] * 3, type=pa.binary()),
            "text": pa.array(["t1", "t1", "t2"], type=pa.string()),
        }
    )
    docs = ingest_pages(rd.from_arrow(pages), canonicalize_urls=True).to_pandas()
    # the two variants of /p collapse to one doc key
    assert docs["doc_id"].nunique() == 2
    without = ingest_pages(rd.from_arrow(pages)).to_pandas()
    assert without["doc_id"].nunique() == 3

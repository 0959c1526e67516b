"""Deterministic synthetic Common-Crawl-style ``pages`` corpus.

Schema per BASELINE.json input_hint:
    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

Planted duplicate structure (FIXTURES.md F1) with a ``truth.parquet``
sidecar (url, true_cluster, dup_kind) — the analog of the reference's
ground-truth labels embedded in query headers
(/root/reference/src/classification.cpp:111-131). Fixed seed, pure
numpy; no external data.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_VOCAB = [
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog", "data",
    "stream", "table", "query", "index", "shard", "merge", "sort", "hash",
    "batch", "window", "cluster", "page", "crawl", "web", "text", "token",
    "dedup", "minhash", "band", "bucket", "union", "find", "ray", "arrow",
    "parquet", "block", "spill", "shuffle", "actor", "pool", "vector",
    "signal", "metric", "lineage", "resume", "checkpoint", "anchor", "span",
    "march", "april", "london", "paris", "berlin", "river", "mountain",
    "green", "silver", "market", "garden", "station", "journal", "report",
]

_BASE_TS = 1_600_000_000_000_000  # us epoch


def _doc_tokens(rng: np.random.Generator, n_tokens: int) -> list[str]:
    idx = rng.integers(0, len(_VOCAB), size=n_tokens)
    return [_VOCAB[i] for i in idx]


def _mutate(rng: np.random.Generator, toks: list[str], rate: float) -> list[str]:
    out = []
    for t in toks:
        r = rng.random()
        if r < rate * 0.6:
            out.append(_VOCAB[int(rng.integers(0, len(_VOCAB)))])  # substitute
        elif r < rate:
            continue  # delete
        else:
            out.append(t)
    return out


def generate_pages(
    n_docs: int,
    seed: int = 42,
    *,
    null_text_frac: float = 0.1,
    min_tokens: int = 80,
    max_tokens: int = 400,
) -> tuple[pa.Table, pa.Table]:
    """Returns (pages_table, truth_table). Deterministic in (n_docs, seed)."""
    rng = np.random.default_rng(seed)
    texts: list[str] = []
    kinds: list[str] = []
    clusters: list[int] = []
    cluster_id = 0
    while len(texts) < n_docs:
        remaining = n_docs - len(texts)
        kind_roll = rng.random()
        n_tok = int(rng.integers(min_tokens, max_tokens))
        base = _doc_tokens(rng, n_tok)
        if kind_roll < 0.60 or remaining < 2:
            texts.append(" ".join(base))
            kinds.append("unique")
            clusters.append(cluster_id)
        elif kind_roll < 0.85:
            g = min(int(rng.integers(2, 6)), remaining)
            t = " ".join(base)
            for _ in range(g):
                texts.append(t)
                kinds.append("exact")
                clusters.append(cluster_id)
        elif kind_roll < 0.95:
            g = min(int(rng.integers(2, 5)), remaining)
            texts.append(" ".join(base))
            kinds.append("near")
            clusters.append(cluster_id)
            for _ in range(g - 1):
                rate = float(rng.uniform(0.01, 0.15))
                texts.append(" ".join(_mutate(rng, base, rate)))
                kinds.append("near")
                clusters.append(cluster_id)
        else:
            g = min(2, remaining)
            shared = _doc_tokens(rng, 120)  # long shared span
            for _ in range(g):
                own = _doc_tokens(rng, n_tok)
                cut = int(rng.integers(0, len(own)))
                texts.append(" ".join(own[:cut] + shared + own[cut:]))
                kinds.append("substring")
                clusters.append(cluster_id)
        cluster_id += 1

    texts = texts[:n_docs]
    kinds = kinds[:n_docs]
    clusters = clusters[:n_docs]

    n = len(texts)
    site = rng.integers(0, 20, size=n)
    urls = [f"https://site{site[i]}.example/p/{i}" for i in range(n)]
    ts = _BASE_TS + np.arange(n, dtype=np.int64) * 37_000_000
    langs = rng.choice(["en", "en", "en", "en", "en", "en", "en", "en", "de", "es"], size=n)

    # html wraps text so extraction is invertible; some rows get text=null
    htmls = [
        (
            "<html><head><title>p</title><script>var x=1;</script></head>"
            f"<body><p>{t}</p><!-- c --></body></html>"
        ).encode()
        for t in texts
    ]
    null_mask = rng.random(n) < null_text_frac
    text_col = [None if null_mask[i] else texts[i] for i in range(n)]

    pages = pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(text_col, type=pa.string()),
            "lang": pa.array(langs.tolist(), type=pa.string()),
        }
    )
    truth = pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "true_cluster": pa.array(clusters, type=pa.int64()),
            "dup_kind": pa.array(kinds, type=pa.string()),
        }
    )
    return pages, truth


def write_pages_corpus(
    out_dir: str, n_docs: int, seed: int = 42, n_files: int = 4, **kw
) -> str:
    """Write a partitioned pages corpus + truth sidecar; returns out_dir.

    Multiple files so ray.data reads produce multiple blocks (and so the
    resumable-output layout is exercised)."""
    pages, truth = generate_pages(n_docs, seed, **kw)
    pages_dir = os.path.join(out_dir, "pages")
    os.makedirs(pages_dir, exist_ok=True)
    n = pages.num_rows
    step = (n + n_files - 1) // n_files
    for f in range(n_files):
        lo, hi = f * step, min((f + 1) * step, n)
        if lo >= hi:
            break
        pq.write_table(pages.slice(lo, hi - lo), os.path.join(pages_dir, f"part-{f:05d}.parquet"))
    pq.write_table(truth, os.path.join(out_dir, "truth.parquet"))
    return out_dir

"""Query registry: every operator exposed as a callable(sf_dir) -> result,
with (where SQL-expressible) a DuckDB oracle in ORACLE_SQL.

Column names in the Ray results match the oracle SQL exactly (the
driver's compare hashes values under sorted column names).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from metacache_mpi_ray.config import DedupConfig
from metacache_mpi_ray.stages.ingest import ingest_documents, read_docs
from metacache_mpi_ray.stages.textstats import (
    LangIdScorer,
    fingerprint_batch,
    quality_score_batch,
    token_count_batch,
)

CFG = DedupConfig()


def _documents(sf_dir: str, columns=None):
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# ---------------------------------------------------------------------------
# oracle-checkable queries on the documents / lineitem / events tables
# ---------------------------------------------------------------------------

def q_exact_dedup_groups(sf_dir: str):
    """Exact dedup (D2 analog): one representative per identical text.

    Groups by a 64-bit content hash instead of the full text (the
    shuffle moves 8 bytes/row, not the document), then aggregates.
    """
    docs = read_docs(sf_dir)
    out = docs.groupby("text_hash").aggregate(
        Min("doc_id", alias_name="rep_id"), Count(alias_name="dup_count")
    )
    return out.select_columns(["rep_id", "dup_count"])


def q_distinct_docs(sf_dir: str):
    """Count of distinct document texts (exact-dedup cardinality)."""
    docs = read_docs(sf_dir)
    n = docs.groupby("text_hash").aggregate(Count(alias_name="c")).count()
    return pa.table({"n_distinct": pa.array([n], type=pa.int64())})


def q_dup_size_histogram(sf_dir: str):
    """Cluster-size histogram (abundance-style output, A4/A5 analog)."""
    docs = read_docs(sf_dir)
    groups = docs.groupby("text_hash").aggregate(Count(alias_name="dup_count"))
    return groups.groupby("dup_count").aggregate(Count(alias_name="n_groups"))


def q_lang_counts(sf_dir: str):
    ds = _documents(sf_dir, columns=["lang"])
    return ds.groupby("lang").aggregate(Count(alias_name="n_docs"))


def q_source_length_stats(sf_dir: str):
    """Per-source integer length stats (A9 analog — bucket stats)."""
    ds = _documents(sf_dir, columns=["source", "n_chars"])
    return ds.groupby("source").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_chars", alias_name="total_chars"),
        Min("n_chars", alias_name="min_chars"),
        Max("n_chars", alias_name="max_chars"),
    )


def q_top_docs_by_length(sf_dir: str):
    """Global top-k (O2/O4 analog: bounded top list)."""
    ds = _documents(sf_dir, columns=["doc_id", "n_chars"])
    return ds.sort(["n_chars", "doc_id"], descending=[True, False]).limit(20)


def q_token_counts(sf_dir: str):
    ds = _documents(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(token_count_batch, batch_format="pyarrow")


def q_quality_scores(sf_dir: str):
    ds = _documents(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(quality_score_batch, batch_format="pyarrow")


def q_token_count_stats(sf_dir: str):
    """Aggregate of a per-row transform (map -> partial agg -> final)."""
    ds = _documents(sf_dir, columns=["doc_id", "text"])
    toks = ds.map_batches(token_count_batch, batch_format="pyarrow")
    return toks.groupby(None).aggregate(
        Sum("n_tokens", alias_name="total_tokens"),
        Max("n_tokens", alias_name="max_tokens"),
        Min("n_tokens", alias_name="min_tokens"),
    )


def q_lineitem_pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped grouped aggregate over lineitem (A4 analog:
    per-taxon counts — partial aggregation inside map_batches comes free
    with Ray's hash aggregate)."""
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_shipdate"],
    )
    ds = ds.map_batches(
        lambda t: t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(np.datetime64("1998-09-02", "us")))),
        batch_format="pyarrow",
    )
    out = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Count(alias_name="count_order"),
    )
    # l_quantity is integer-valued; emit as int64 so the oracle hash matches
    def cast_qty(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("sum_qty"),
            "sum_qty",
            pc.cast(pc.round(t["sum_qty"]), pa.int64()),
        )

    return out.map_batches(cast_qty, batch_format="pyarrow")


def q_events_window_agg(sf_dir: str):
    """Tumbling 1h event-time window per user (streaming-shaped op over
    the ordered log; SURVEY.md §2.9 — windows via key+bucket groupby)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"])

    def add_window(t: pa.Table) -> pa.Table:
        win = pc.divide(t["ts"].cast(pa.int64()), 3600_000_000)
        return t.append_column("window_id", win)

    ds = ds.map_batches(add_window, batch_format="pyarrow")
    return ds.groupby(["user_id", "window_id"]).aggregate(
        Count(alias_name="n_events"),
        Min("event_id", alias_name="first_event"),
        Max("event_id", alias_name="last_event"),
    )


def q_doc_fingerprints(sf_dir: str):
    ds = _documents(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# non-SQL-expressible pipelines (rows-only driver check; full correctness
# in pytest vs brute-force oracles)
# ---------------------------------------------------------------------------

def q_minhash_clusters(sf_dir: str):
    """Flagship MinHash/LSH near-dup clustering over documents."""
    from metacache_mpi_ray.pipelines.dedup import near_dup_pipeline

    docs = read_docs(sf_dir)
    return near_dup_pipeline(docs, CFG, num_partitions=8).clusters


def q_minhash_signatures(sf_dir: str):
    from metacache_mpi_ray.stages.signatures import compute_signatures

    docs = read_docs(sf_dir)
    sigs = compute_signatures(docs, CFG)
    # project sig out of the result (fixed_size_list hashing isn't
    # SQL-comparable anyway); expose stable per-doc sig checksum
    def checksum(t: pa.Table) -> pa.Table:
        from metacache_mpi_ray.stages.signatures import sig_from_arrow

        s = sig_from_arrow(t["sig"])
        chk = (s.sum(axis=1, dtype=np.uint64) >> np.uint64(1)).astype(np.int64)
        return pa.table({"doc_id": t["doc_id"], "sig_checksum": pa.array(chk)})

    return sigs.map_batches(checksum, batch_format="pyarrow")


def q_simhash_dup_pairs(sf_dir: str):
    from metacache_mpi_ray.stages.simhash import simhash_dedup

    docs = read_docs(sf_dir)
    return simhash_dedup(docs, CFG, num_partitions=8)


def q_lang_id(sf_dir: str):
    from metacache_mpi_ray.functions.resources import default_actor_concurrency

    ds = _documents(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(
        LangIdScorer,
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=default_actor_concurrency(reserve=2, cap=8),
        num_cpus=1,
    )


def q_substring_candidates(sf_dir: str):
    from metacache_mpi_ray.stages.substring import anchor_candidates

    docs = read_docs(sf_dir)
    return anchor_candidates(docs, CFG, num_partitions=8)


def q_ann_topk(sf_dir: str):
    from metacache_mpi_ray.stages.ann import brute_force_topk

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return brute_force_topk(emb, query_ids=list(range(10)), k=5)


def q_embedding_near_dup(sf_dir: str):
    from metacache_mpi_ray.stages.ann import embedding_near_dup

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return embedding_near_dup(emb, sim_threshold=0.95, num_partitions=8)


QUERIES = {
    "exact_dedup_groups": q_exact_dedup_groups,
    "distinct_docs": q_distinct_docs,
    "dup_size_histogram": q_dup_size_histogram,
    "lang_counts": q_lang_counts,
    "source_length_stats": q_source_length_stats,
    "top_docs_by_length": q_top_docs_by_length,
    "token_counts": q_token_counts,
    "quality_scores": q_quality_scores,
    "token_count_stats": q_token_count_stats,
    "lineitem_pricing_summary": q_lineitem_pricing_summary,
    "events_window_agg": q_events_window_agg,
    "doc_fingerprints": q_doc_fingerprints,
    # non-SQL (rows-only driver check):
    "minhash_clusters": q_minhash_clusters,
    "minhash_signatures": q_minhash_signatures,
    "simhash_dup_pairs": q_simhash_dup_pairs,
    "lang_id": q_lang_id,
    "substring_candidates": q_substring_candidates,
    "ann_topk": q_ann_topk,
    "embedding_near_dup": q_embedding_near_dup,
}


_STOP_RE_SQL = r"\b(the|and|of|a|to|in|is|it|that|for)\b"

ORACLE_SQL = {
    "exact_dedup_groups": (
        "SELECT min(doc_id) AS rep_id, count(*) AS dup_count "
        "FROM documents GROUP BY text"
    ),
    "distinct_docs": "SELECT count(DISTINCT text) AS n_distinct FROM documents",
    "dup_size_histogram": (
        "SELECT dup_count, count(*) AS n_groups FROM ("
        "  SELECT count(*) AS dup_count FROM documents GROUP BY text"
        ") GROUP BY dup_count"
    ),
    "lang_counts": "SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang",
    "source_length_stats": (
        "SELECT source, count(*) AS n_docs, "
        "CAST(sum(n_chars) AS BIGINT) AS total_chars, "
        "min(n_chars) AS min_chars, max(n_chars) AS max_chars "
        "FROM documents GROUP BY source"
    ),
    "top_docs_by_length": (
        "SELECT doc_id, n_chars FROM documents "
        "ORDER BY n_chars DESC, doc_id ASC LIMIT 20"
    ),
    "token_counts": (
        "SELECT doc_id, array_length(regexp_split_to_array(trim(text), '\\s+')) "
        "AS n_tokens FROM documents"
    ),
    "quality_scores": (
        "SELECT doc_id, length(text) AS n_chars_text, "
        "array_length(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens, "
        f"array_length(regexp_extract_all(text, '{_STOP_RE_SQL}')) AS n_stopwords "
        "FROM documents"
    ),
    "token_count_stats": (
        "SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens, "
        "max(n_tokens) AS max_tokens, "
        "min(n_tokens) AS min_tokens FROM ("
        "  SELECT array_length(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens"
        "  FROM documents)"
    ),
    "lineitem_pricing_summary": (
        "SELECT l_returnflag, l_linestatus, "
        "CAST(sum(l_quantity) AS BIGINT) AS sum_qty, count(*) AS count_order "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
        "GROUP BY l_returnflag, l_linestatus"
    ),
    "events_window_agg": (
        "SELECT user_id, epoch_us(ts) // 3600000000 AS window_id, "
        "count(*) AS n_events, min(event_id) AS first_event, "
        "max(event_id) AS last_event "
        "FROM events GROUP BY user_id, epoch_us(ts) // 3600000000"
    ),
    "ann_topk": (
        "SELECT query_id, neighbor_id, rank FROM ("
        "  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id, "
        "    row_number() OVER ("
        "      PARTITION BY q.vec_id "
        "      ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC, e.vec_id ASC"
        "    ) AS rank "
        "  FROM embeddings q CROSS JOIN embeddings e "
        "  WHERE q.vec_id < 10 AND e.vec_id <> q.vec_id"
        ") WHERE rank <= 5"
    ),
}

"""End-to-end correctness of the MinHash/LSH dedup pipeline against a
brute-force O(n^2) exact-Jaccard oracle (SURVEY.md §5: ground-truth
style validation, mirroring the reference's embedded-ground-truth
evaluation at /root/reference/src/classification.cpp:111-131).

Gate (BASELINE.json): dup-pair recall >= 0.99 at the configured
shingle/signature config.
"""

import itertools

import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from metacache_mpi_ray.config import DedupConfig
from metacache_mpi_ray.functions.hashing import concat_shingle_hashes
from metacache_mpi_ray.functions.text import extract_text_from_html, normalize_text_py
from metacache_mpi_ray.pipelines.dedup import near_dup_pipeline
from metacache_mpi_ray.stages.ingest import ingest_pages

CFG = DedupConfig()


def _oracle_shingle_sets(corpus_dir):
    """url -> set of shingle hashes, computed independently of the Ray path
    (single-process reference implementation)."""
    pages = pq.read_table(f"{corpus_dir}/pages")
    texts = []
    for url, html, text in zip(
        pages["url"].to_pylist(), pages["html"].to_pylist(), pages["text"].to_pylist()
    ):
        t = text if text is not None else extract_text_from_html(html)
        texts.append(normalize_text_py(t).encode("utf-8"))
    hashes, offsets = concat_shingle_hashes(texts, CFG.shingle_k, CFG.seed)
    urls = pages["url"].to_pylist()
    return {
        urls[i]: set(hashes[offsets[i] : offsets[i + 1]].tolist())
        for i in range(len(urls))
    }


@pytest.fixture(scope="module")
def pipeline_result(corpus_dir):
    pages = rd.read_parquet(f"{corpus_dir}/pages")
    docs = ingest_pages(pages)
    res = near_dup_pipeline(docs, CFG, num_partitions=8)
    clusters = res.clusters.to_pandas()
    docs_pd = docs.to_pandas()[["doc_id", "url"]]
    merged = clusters.merge(docs_pd, on="doc_id")
    return merged  # doc_id, cluster_id, is_dup, url


def test_recall_vs_bruteforce_oracle(corpus_dir, pipeline_result):
    shingles = _oracle_shingle_sets(corpus_dir)
    urls = sorted(shingles)
    truth_pairs = []
    for u, v in itertools.combinations(urls, 2):
        su, sv = shingles[u], shingles[v]
        inter = len(su & sv)
        if inter == 0:
            continue
        j = inter / (len(su) + len(sv) - inter)
        if j >= CFG.sim_threshold:
            truth_pairs.append((u, v))
    assert len(truth_pairs) > 50, "corpus must plant enough duplicate pairs"

    cluster_of = dict(zip(pipeline_result["url"], pipeline_result["cluster_id"]))
    found = sum(1 for u, v in truth_pairs if cluster_of[u] == cluster_of[v])
    recall = found / len(truth_pairs)
    assert recall >= 0.99, f"dup-pair recall {recall:.4f} < 0.99 ({found}/{len(truth_pairs)})"


def test_low_similarity_pairs_stay_separate(corpus_dir, pipeline_result):
    """Negative controls: pairs well below threshold must not be directly
    clustered unless bridged transitively through real dups. We check
    clusters don't collapse: number of clusters stays close to truth."""
    shingles = _oracle_shingle_sets(corpus_dir)
    cluster_of = dict(zip(pipeline_result["url"], pipeline_result["cluster_id"]))
    # sample disjoint-ish pairs
    urls = sorted(shingles)
    rng = np.random.default_rng(0)
    bad = 0
    checked = 0
    for _ in range(2000):
        u, v = rng.choice(urls, 2, replace=False)
        su, sv = shingles[u], shingles[v]
        inter = len(su & sv)
        j = inter / (len(su) + len(sv) - inter) if inter else 0.0
        if j < 0.3:
            checked += 1
            if cluster_of[u] == cluster_of[v]:
                bad += 1
    assert checked > 1000
    assert bad / checked < 0.01, f"{bad}/{checked} dissimilar pairs wrongly clustered"


def test_exact_duplicates_always_cluster(corpus_dir, pipeline_result):
    truth = pq.read_table(f"{corpus_dir}/truth.parquet").to_pandas()
    merged = pipeline_result.merge(truth, on="url")
    exact = merged[merged["dup_kind"] == "exact"]
    # every exact-dup truth group maps to exactly one output cluster
    n_out = exact.groupby("true_cluster")["cluster_id"].nunique()
    assert (n_out == 1).all()
    assert exact["is_dup"].all()


def test_pipeline_deterministic(corpus_dir):
    pages = rd.read_parquet(f"{corpus_dir}/pages")
    r1 = near_dup_pipeline(ingest_pages(pages), CFG, num_partitions=8).clusters.to_pandas()
    r2 = near_dup_pipeline(ingest_pages(pages), CFG, num_partitions=4).clusters.to_pandas()
    m = r1.sort_values("doc_id").reset_index(drop=True).merge(
        r2.sort_values("doc_id").reset_index(drop=True), on="doc_id"
    )
    assert (m["cluster_id_x"] == m["cluster_id_y"]).all()
    assert (m["is_dup_x"] == m["is_dup_y"]).all()
def test_pipeline_block_size_invariant(corpus_dir):
    """~16 KB blocks force hundreds of sorted-stream fragments; every
    bucket/segment stitch must reassemble them to the identical result
    (the at-scale regime where buckets straddle block boundaries)."""
    from ray.data import DataContext

    pages = rd.read_parquet(f"{corpus_dir}/pages")
    base = near_dup_pipeline(ingest_pages(pages), CFG, num_partitions=8).clusters.to_pandas()
    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 16 * 1024
        tiny = near_dup_pipeline(ingest_pages(pages), CFG, num_partitions=8).clusters.to_pandas()
    finally:
        ctx.target_max_block_size = old
    m = base.sort_values("doc_id").reset_index(drop=True).merge(
        tiny.sort_values("doc_id").reset_index(drop=True), on="doc_id"
    )
    assert len(m) == len(base)
    assert (m["cluster_id_x"] == m["cluster_id_y"]).all()
    assert (m["is_dup_x"] == m["is_dup_y"]).all()


def test_flagship_only_claims_prededuped_when_it_deduped(monkeypatch, corpus_dir):
    """r5 incident pin: with the default dedupe_pairs=False the
    flagship's edges carry raw per-band multiplicity, and verify MUST
    NOT be told they are distinct — that claim disables the join
    fallback's distinct-pairs guard and re-creates the measured
    payload-times-multiplicity spill at 4M docs. White-box: capture the
    kwarg for both settings."""
    import metacache_mpi_ray.pipelines.dedup as dd

    seen = {}
    real = dd.verify_edges

    def spy(edges, sigs, cfg, **kw):
        seen[kw.get("pre_deduped", False)] = True
        return real(edges, sigs, cfg, **kw)

    monkeypatch.setattr(dd, "verify_edges", spy)
    docs = ingest_pages(rd.read_parquet(f"{corpus_dir}/pages")).materialize()
    dd.near_dup_pipeline(docs, CFG, num_partitions=4, dedupe_pairs=False)
    assert seen == {False: True}
    seen.clear()
    dd.near_dup_pipeline(docs, CFG, num_partitions=4, dedupe_pairs=True)
    assert seen == {True: True}

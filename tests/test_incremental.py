"""Incremental query-against-persisted-index mode (the reference's
build-once/query-many shape, mode_query.cpp:404-455)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from metacache_mpi_ray.config import DedupConfig
from metacache_mpi_ray.pipelines.incremental import (
    build_index,
    query_against_index,
)
from metacache_mpi_ray.stages.ingest import ingest_documents, ingest_pages
from metacache_mpi_ray.state.checkpoint import ConfigMismatch


@pytest.fixture(scope="module")
def index_root(tmp_path_factory, corpus_dir):
    cfg = DedupConfig()
    root = str(tmp_path_factory.mktemp("qidx") / "root")
    docs = ingest_pages(rd.read_parquet(f"{corpus_dir}/pages"))
    clusters = build_index(docs, cfg, root, num_partitions=4)
    return root, clusters.to_pandas(), corpus_dir


def test_query_matches_copies_and_rejects_fresh(index_root):
    root, idx_clusters, corpus_dir = index_root
    pages = rd.read_parquet(f"{corpus_dir}/pages").to_pandas()
    # B = exact copies of 20 stored pages (new ids) + 20 fresh docs made
    # of an alien alphabet (shares no shingles with the corpus)
    copies = pages.head(20)
    b_tab = pa.table(
        {
            "doc_id": pa.array(
                list(range(10_000_000, 10_000_020))
                + list(range(20_000_000, 20_000_020)),
                type=pa.int64(),
            ),
            "text": pa.array(
                [
                    t if t is not None else ""
                    for t in copies["text"].where(
                        copies["text"].notna(), copies["html"].astype(str)
                    )
                ][:20]
                + [f"zzqx{i} " * 60 for i in range(20)],
                type=pa.string(),
            ),
        }
    )
    # resolve copies' text the same way ingest does (html fallback rows
    # carry the raw html string here; they just need to MATCH the index
    # only when the extracted text matches — so use only non-null rows)
    non_null = copies["text"].notna().to_numpy()
    b_docs = ingest_documents(rd.from_arrow(b_tab))
    out = query_against_index(b_docs, root, num_partitions=4).to_pandas()
    out = out.set_index("doc_id")
    # fresh docs never match
    for i in range(20_000_000, 20_000_020):
        assert not out.loc[i, "matched"]
        assert out.loc[i, "matched_cluster_id"] == -1
    # exact copies of resolved-text pages always match
    hits = [
        10_000_000 + j for j in range(20) if non_null[j]
    ]
    assert len(hits) >= 10
    for i in hits:
        assert out.loc[i, "matched"]
        assert out.loc[i, "matched_cluster_id"] >= 0


def test_matched_cluster_resolves_to_index_cluster(index_root):
    """A copy of a stored page must resolve to that page's own cluster
    in the persisted clusters artifact."""
    root, idx_clusters, corpus_dir = index_root
    pages = rd.read_parquet(f"{corpus_dir}/pages").to_pandas()
    row = pages[pages["text"].notna()].iloc[0]
    b_docs = ingest_documents(
        rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([77_000_001], type=pa.int64()),
                    "text": pa.array([row["text"]], type=pa.string()),
                }
            )
        )
    )
    out = query_against_index(b_docs, root, num_partitions=4).to_pandas()
    assert bool(out["matched"].iloc[0])
    # the stored doc's id = hash(url); find its cluster via the url hash
    from metacache_mpi_ray.stages.ingest import _col_hash_i63

    stored_id = int(_col_hash_i63(pa.array([row["url"]]), seed=11)[0])
    stored_cluster = int(
        idx_clusters.set_index("doc_id").loc[stored_id, "cluster_id"]
    )
    assert int(out["matched_cluster_id"].iloc[0]) == stored_cluster


def test_query_all_fresh_batch_matches_nothing(index_root):
    """A batch where NO doc matches the index must return a full
    (matched=False, -1) frame — regression: the empty match groupby
    loses its schema on to_pandas() and used to raise KeyError."""
    root, _, _ = index_root
    b_docs = ingest_documents(
        rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(30_000_000, 30_000_008), type=pa.int64()),
                    "text": pa.array(
                        [f"qwkx{i} vbzn{i} " * 40 for i in range(8)], type=pa.string()
                    ),
                }
            )
        )
    )
    out = query_against_index(b_docs, root, num_partitions=4).to_pandas()
    assert len(out) == 8
    assert not out["matched"].any()
    assert (out["matched_cluster_id"] == -1).all()


def test_query_probe_telemetry_and_sig_pruning(index_root):
    """Every query_against_index run appends a metrics.jsonl row with
    the candidate/verified/matched counts (r3 verdict item 9), and the
    verify stage's signature read is footer-pruned: a batch with zero
    candidate pairs reads ZERO corpus-signature files."""
    import json
    import os

    root, _, corpus_dir = index_root
    mpath = os.path.join(root, "metrics.jsonl")

    def probe_rows():
        if not os.path.exists(mpath):
            return []
        with open(mpath) as f:
            return [
                json.loads(l) for l in f if '"query_probe"' in l
            ]

    before = len(probe_rows())
    # alien-alphabet batch: no shingle overlap -> zero candidate pairs
    fresh = ingest_documents(
        rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(40_000_000, 40_000_006), type=pa.int64()),
                    "text": pa.array(
                        [f"jjqv{i} xxwp{i} " * 40 for i in range(6)],
                        type=pa.string(),
                    ),
                }
            )
        )
    )
    out = query_against_index(fresh, root, num_partitions=4).to_pandas()
    assert not out["matched"].any()
    rows = probe_rows()
    assert len(rows) == before + 1
    r = rows[-1]
    assert r["status"] == "ok"
    assert r["n_candidate_pairs"] == 0
    assert r["n_verified"] == 0
    assert r["n_matched_new_docs"] == 0
    assert r["sig_files_read"] == 0  # zero corpus-signature bytes

    # a matching batch must verify and read at least one (but only
    # intersecting) signature files
    pages = rd.read_parquet(f"{corpus_dir}/pages").to_pandas()
    copy = pages[pages["text"].notna()].head(3)
    match_docs = ingest_documents(
        rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(41_000_000, 41_000_003), type=pa.int64()),
                    "text": pa.array(list(copy["text"]), type=pa.string()),
                }
            )
        )
    )
    out2 = query_against_index(match_docs, root, num_partitions=4).to_pandas()
    assert out2["matched"].any()
    r2 = probe_rows()[-1]
    assert r2["n_candidate_pairs"] > 0
    assert r2["n_verified"] > 0
    assert 1 <= r2["sig_files_read"] <= r2["sig_files_total"]


def test_sig_file_intersects_footer_stats(tmp_path):
    """Unit pin for the footer-range test both the serial and the
    fan-out (>64 files) pruning paths share."""
    import pyarrow.parquet as pq
    import ray

    from metacache_mpi_ray.pipelines.incremental import (
        _intersecting_sig_files,
        _sig_file_intersects,
    )

    lo = tmp_path / "lo.parquet"
    hi = tmp_path / "hi.parquet"
    pq.write_table(pa.table({"doc_id": pa.array([10, 20, 30], pa.int64())}), lo)
    pq.write_table(pa.table({"doc_id": pa.array([100, 200], pa.int64())}), hi)
    ids = np.array([25, 26], dtype=np.int64)  # inside lo's range only
    assert _sig_file_intersects(str(lo), ids)
    assert not _sig_file_intersects(str(hi), ids)
    # id between row-group min/max but absent still keeps the file
    # (range test, exactness comes from verify)
    assert _sig_file_intersects(str(lo), np.array([15], dtype=np.int64))
    kept = ray.get(_intersecting_sig_files.remote([str(lo), str(hi)], ids))
    assert kept == [str(lo)]


def test_query_refuses_config_mismatch(index_root):
    root, _, _ = index_root
    other = DedupConfig(sim_threshold=0.9)
    b_docs = ingest_documents(
        rd.from_arrow(
            pa.table(
                {"doc_id": pa.array([1], type=pa.int64()),
                 "text": pa.array(["hello world"], type=pa.string())}
            )
        )
    )
    with pytest.raises(ConfigMismatch):
        query_against_index(b_docs, root, other)


def test_build_index_resumes_from_checkpoint(index_root, corpus_dir):
    """Re-running build_index over the same root reuses every stage
    (all .done markers present -> no stage recompute)."""
    import os
    import time

    root, idx_clusters, _ = index_root
    for stage in ("signatures", "edges", "verified", "clusters"):
        assert os.path.exists(os.path.join(root, f"{stage}.done"))
    docs = ingest_pages(rd.read_parquet(f"{corpus_dir}/pages"))
    t0 = time.time()
    again = build_index(docs, DedupConfig(), root, num_partitions=4).to_pandas()
    resumed_in = time.time() - t0
    a = again.sort_values("doc_id").reset_index(drop=True)
    b = idx_clusters.sort_values("doc_id").reset_index(drop=True)
    assert (a["cluster_id"].values == b["cluster_id"].values).all()
    assert resumed_in < 30  # pure read-back, no recompute


def test_incremental_agrees_with_full_recompute(tmp_path, corpus_dir):
    """dedup(A) + query(B vs A) must agree with dedup(A ∪ B) on which B
    docs are duplicates of A — the oracle recomputation check."""
    from metacache_mpi_ray.pipelines.dedup import near_dup_pipeline

    cfg = DedupConfig()
    pages = rd.read_parquet(f"{corpus_dir}/pages").to_pandas()
    pages = pages[pages["text"].notna()].reset_index(drop=True)
    n = len(pages)
    a_df = pages.iloc[: n // 2]
    a_tab = pa.table(
        {
            "doc_id": pa.array(np.arange(len(a_df)), type=pa.int64()),
            "text": pa.array(a_df["text"].tolist(), type=pa.string()),
        }
    )
    # B: copies of 15 A docs + 15 fresh alien docs
    b_texts = a_df["text"].head(15).tolist() + [f"qj{i}w " * 80 for i in range(15)]
    b_tab = pa.table(
        {
            "doc_id": pa.array(np.arange(len(b_texts)) + 1_000_000, type=pa.int64()),
            "text": pa.array(b_texts, type=pa.string()),
        }
    )
    root = str(tmp_path / "idx")
    a_docs = ingest_documents(rd.from_arrow(a_tab))
    build_index(a_docs, cfg, root, num_partitions=4)
    b_docs = ingest_documents(rd.from_arrow(b_tab))
    got = (
        query_against_index(b_docs, root, num_partitions=4)
        .to_pandas()
        .set_index("doc_id")["matched"]
    )

    # full recompute over A ∪ B
    both = ingest_documents(
        rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.concat_arrays(
                        [a_tab["doc_id"].combine_chunks(), b_tab["doc_id"].combine_chunks()]
                    ),
                    "text": pa.concat_arrays(
                        [a_tab["text"].combine_chunks(), b_tab["text"].combine_chunks()]
                    ),
                }
            )
        )
    )
    full = near_dup_pipeline(both, cfg, num_partitions=4).clusters.to_pandas()
    full = full.set_index("doc_id")
    a_ids = set(a_tab["doc_id"].to_pylist())
    cluster_members: dict[int, list[int]] = {}
    for d, c in full["cluster_id"].items():
        cluster_members.setdefault(int(c), []).append(int(d))
    for bid in b_tab["doc_id"].to_pylist():
        c = int(full.loc[bid, "cluster_id"])
        has_a_partner = any(m in a_ids for m in cluster_members[c] if m != bid)
        assert bool(got.loc[bid]) == has_a_partner, bid


def test_probe_bridge_stitch_across_batch_boundary():
    """A band bucket split across probe batches must still emit its
    cross-fragment new x stored pairs (round-2 probed per fragment)."""
    from metacache_mpi_ray.pipelines.incremental import probe_tagged_bands

    # bucket bkey=5: stored {1,2,3} + new {11,12,13}; bucket bkey=9:
    # stored {4} + new {14}. batch_size=4 splits bucket 5 into a 4-row
    # and a 2-row fragment whatever the within-key order is.
    tab = pa.table(
        {
            "bkey": pa.array([5] * 6 + [9] * 2, type=pa.int64()),
            "id": pa.array([1, 2, 3, 11, 12, 13, 4, 14], type=pa.int64()),
            "side": pa.array([0, 0, 0, 1, 1, 1, 0, 1], type=pa.int8()),
        }
    )
    pairs = probe_tagged_bands(
        rd.from_arrow(tab), cap=256, probe_batch_size=4
    ).to_pandas()
    got = set(zip(pairs["a"], pairs["b"]))
    want = {(n, s) for n in (11, 12, 13) for s in (1, 2, 3)} | {(14, 4)}
    assert got == want

    # over-cap reassembled bucket: no cross-fragment pairs added
    pairs_capped = probe_tagged_bands(
        rd.from_arrow(tab), cap=4, probe_batch_size=4
    ).to_pandas()
    got_capped = set(zip(pairs_capped["a"], pairs_capped["b"]))
    # bucket 5 has 6 members > cap=4: only per-fragment emission of
    # fragments <= cap may appear, and never pairs requiring the full
    # bucket; bucket 9 (2 members) survives intact
    assert (14, 4) in got_capped
    assert not {(11, 1), (12, 2), (13, 3)} <= got_capped


def test_probe_emit_new_new_across_batch_boundaries():
    """emit_new_new (the extend-mode probe): every (new x new) pair of a
    surviving bucket must be emitted even when the bucket is split
    across probe batches — compared against a brute-force enumeration
    over several forced batch sizes."""
    import itertools

    from metacache_mpi_ray.pipelines.incremental import probe_tagged_bands

    rng = np.random.default_rng(7)
    rows = []
    # 6 buckets with varying stored/new mixes, incl. new-only and
    # stored-only buckets and one over-cap bucket
    specs = [(5, 3, 3), (9, 1, 1), (12, 0, 4), (15, 2, 0), (21, 4, 5), (30, 1, 2)]
    next_id = 1
    for bkey, n_stored, n_new in specs:
        for s in range(n_stored):
            rows.append((bkey, next_id, 0)); next_id += 1
        for nn in range(n_new):
            rows.append((bkey, 100 + next_id, 1)); next_id += 1
    perm = rng.permutation(len(rows))
    tab = pa.table(
        {
            "bkey": pa.array([rows[i][0] for i in perm], type=pa.int64()),
            "id": pa.array([rows[i][1] for i in perm], type=pa.int64()),
            "side": pa.array([rows[i][2] for i in perm], type=pa.int8()),
        }
    )
    # brute force: buckets <= cap must emit EVERY pair (want_min);
    # over-cap buckets may leak a SUBSET of their pairs from
    # per-fragment emission (the documented cap-leniency direction —
    # fragments <= cap emit in-kernel before the stitch sees the
    # reassembled total; same behavior as the flagship's bucket_edges)
    want_min, allowed_extra = set(), set()
    cap = 8
    by_key: dict[int, list[tuple[int, int]]] = {}
    for bkey, i, side in rows:
        by_key.setdefault(bkey, []).append((i, side))
    for bkey, members in by_key.items():
        new = sorted(i for i, s in members if s == 1)
        stored = sorted(i for i, s in members if s == 0)
        bucket_pairs = {(n, s) for n in new for s in stored} | {
            (a, b) for a, b in itertools.combinations(new, 2)
        }
        if len(members) > cap:
            allowed_extra |= bucket_pairs
        else:
            want_min |= bucket_pairs
    for bs in (2, 3, 5, None):
        pairs = probe_tagged_bands(
            rd.from_arrow(tab), cap=cap, probe_batch_size=bs, emit_new_new=True
        ).to_pandas()
        got = set(zip(pairs["a"], pairs["b"]))
        assert want_min <= got, f"batch_size={bs}: missing {want_min - got}"
        assert got <= want_min | allowed_extra, (
            f"batch_size={bs}: invented {got - want_min - allowed_extra}"
        )
        if bs is None:  # one batch: every bucket whole, exact semantics
            assert got == want_min


def test_query_with_tiny_probe_batches_matches_default(index_root):
    """End-to-end: forcing many probe-batch boundaries must not lose
    matches vs the default batch size."""
    from metacache_mpi_ray.pipelines.incremental import query_against_index

    root, _, corpus_dir = index_root
    pages = rd.read_parquet(f"{corpus_dir}/pages").to_pandas()
    sub = pages.head(12).copy()
    sub["url"] = "http://q.example/" + sub.index.astype(str)
    new_docs = ingest_pages(rd.from_pandas(sub))
    base = query_against_index(new_docs, root, num_partitions=4).to_pandas()
    tiny = query_against_index(
        new_docs, root, num_partitions=4, probe_batch_size=3
    ).to_pandas()
    b = base.sort_values("doc_id").reset_index(drop=True)
    t = tiny.sort_values("doc_id").reset_index(drop=True)
    assert (b["matched"] == t["matched"]).all()
    assert (b["matched_cluster_id"] == t["matched_cluster_id"]).all()
    assert b["matched"].any()


def test_repl_index_agrees_with_batch_query(index_root):
    """S13 analog: per-line interactive lookups must agree with the
    batch query path on matched/unmatched and resolve to the same
    stored cluster."""
    from metacache_mpi_ray.pipelines.incremental import (
        ReplIndex,
        query_against_index,
    )

    root, idx_clusters, corpus_dir = index_root
    pages = rd.read_parquet(f"{corpus_dir}/pages").to_pandas()
    sub = pages.head(10).copy()
    sub["url"] = "http://repl.example/" + sub.index.astype(str)
    new_docs = ingest_pages(rd.from_pandas(sub))
    batch = (
        query_against_index(new_docs, root, num_partitions=4)
        .to_pandas()
        .merge(new_docs.to_pandas()[["doc_id", "norm_text"]], on="doc_id")
    )
    repl = ReplIndex(root)
    n_matched = 0
    for _, r in batch.iterrows():
        got = repl.query(r["norm_text"])
        assert got["matched"] == bool(r["matched"]), r["doc_id"]
        if got["matched"]:
            n_matched += 1
            clusters = {m["cluster_id"] for m in got["matches"]}
            assert int(r["matched_cluster_id"]) in clusters
    assert n_matched > 0
    # unknown text stays unmatched
    assert repl.query("never seen text " * 30)["matched"] is False
def test_repl_index_pre_bands_artifact_fallback(index_root, tmp_path):
    """An index built by an older writer without a bands artifact must
    still serve the repl (same fallback the batch path has)."""
    import shutil

    from metacache_mpi_ray.pipelines.incremental import ReplIndex

    root, _, corpus_dir = index_root
    old_root = str(tmp_path / "old_index")
    shutil.copytree(root, old_root)
    shutil.rmtree(f"{old_root}/bands")
    import os

    for f in os.listdir(old_root):
        if f.startswith("bands."):
            os.remove(os.path.join(old_root, f))
    repl_old = ReplIndex(old_root)
    repl_new = ReplIndex(root)
    pages = rd.read_parquet(f"{corpus_dir}/pages").to_pandas()
    text = pages[pages["text"].notna()]["text"].iloc[0]
    a = repl_old.query(text)
    b = repl_new.query(text)
    assert a["matched"] and b["matched"]
    assert a["matches"][0]["doc_id"] == b["matches"][0]["doc_id"]
    assert not repl_old.query("zzqx unseen " * 40)["matched"]


def test_repl_index_honors_bucket_cap(tmp_path):
    """Over-cap buckets are non-discriminative and skipped by the batch
    probe; the repl must apply the same policy (it used to scan them
    and report matched=True where the batch path says False)."""
    from metacache_mpi_ray.config import DedupConfig
    from metacache_mpi_ray.pipelines.incremental import (
        ReplIndex,
        build_index,
        query_against_index,
    )

    cfg = DedupConfig(bucket_cap=3)
    body = "identical boilerplate body repeated " * 20
    corpus = ingest_documents(
        rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(10), type=pa.int64()),
                    "text": pa.array([body] * 10, type=pa.string()),
                }
            )
        )
    )
    root = str(tmp_path / "capidx")
    build_index(corpus, cfg, root, num_partitions=2)
    probe_doc = ingest_documents(
        rd.from_arrow(
            pa.table(
                {"doc_id": pa.array([999], type=pa.int64()),
                 "text": pa.array([body], type=pa.string())}
            )
        )
    )
    batch = query_against_index(probe_doc, root, num_partitions=2).to_pandas()
    repl = ReplIndex(root).query(body)
    # every band bucket holds all 10 identical docs > cap 3: both paths
    # must agree the probe matches nothing
    assert not batch["matched"].iloc[0]
    assert repl["matched"] is False or repl["matched"] == False  # noqa: E712


def test_repl_index_ram_guard(index_root):
    """ReplIndex refuses (with the artifact byte count, not an OOM) to
    load an index whose on-disk artifacts exceed max_bytes; 0 disables
    the guard; the env override is honored (r4 review item)."""
    import pytest

    from metacache_mpi_ray.pipelines.incremental import ReplIndex

    root, _, _ = index_root
    with pytest.raises(MemoryError, match="bytes on disk"):
        ReplIndex(root, max_bytes=16)
    assert ReplIndex(root, max_bytes=0).sig_ids is not None  # disabled
    import os as _os

    _os.environ["METACACHE_REPL_MAX_BYTES"] = "16"
    try:
        with pytest.raises(MemoryError):
            ReplIndex(root)
    finally:
        del _os.environ["METACACHE_REPL_MAX_BYTES"]
    assert ReplIndex(root).cl_ids is not None  # default limit: loads

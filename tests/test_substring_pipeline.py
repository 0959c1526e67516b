"""Substring-dedup integration + hot-bucket policies + verify-strategy
parity."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from metacache_mpi_ray.config import DedupConfig
from metacache_mpi_ray.pipelines.dedup import near_dup_pipeline
from metacache_mpi_ray.stages.ingest import ingest_pages

CFG = DedupConfig()


def test_substring_stage_clusters_long_shared_spans(corpus_dir):
    truth = pq.read_table(f"{corpus_dir}/truth.parquet").to_pandas()
    docs = ingest_pages(rd.read_parquet(f"{corpus_dir}/pages")).materialize()

    plain = near_dup_pipeline(docs, CFG, num_partitions=4)
    withsub = near_dup_pipeline(docs, CFG, num_partitions=4, include_substring=True)

    docs_pd = docs.to_pandas()[["doc_id", "url"]]

    def clustered_truth_groups(res):
        cl = res.clusters.to_pandas().merge(docs_pd, on="doc_id").merge(truth, on="url")
        sub = cl[cl["dup_kind"] == "substring"]
        grp = sub.groupby("true_cluster")["cluster_id"].nunique()
        return (grp == 1).mean(), len(grp)

    frac_plain, n_groups = clustered_truth_groups(plain)
    frac_sub, _ = clustered_truth_groups(withsub)
    assert n_groups >= 3
    # substring pairs share a long exact span but low whole-doc Jaccard:
    # the substring stage must connect (almost) all of them
    assert frac_sub >= 0.9
    assert frac_sub >= frac_plain


def _hot_bucket_ds():
    """200 rows all landing in ONE bucket (same key)."""
    return rd.from_arrow(
        pa.table(
            {
                "k": pa.array([7] * 200, type=pa.int64()),
                "doc_id": pa.array(range(200), type=pa.int64()),
            }
        )
    )


def test_hot_bucket_policies():
    from metacache_mpi_ray.stages.candidates import bucket_edges

    ds = _hot_bucket_ds()
    drop = bucket_edges(ds, ["k"], cap=50, hot_policy="drop").to_pandas()
    assert len(drop) == 0  # reference semantics: overpopulated key cleared

    star = bucket_edges(ds, ["k"], cap=50, hot_policy="star").to_pandas()
    assert len(star) == 199  # full star, linear in bucket size
    assert (star["a"] == 0).all()

    samp = bucket_edges(ds, ["k"], cap=50, hot_policy="sample").to_pandas()
    assert 0 < len(samp) <= 50
    # deterministic across runs
    samp2 = bucket_edges(_hot_bucket_ds(), ["k"], cap=50, hot_policy="sample").to_pandas()
    assert sorted(samp["b"]) == sorted(samp2["b"])


def test_verify_join_strategy_matches_broadcast(corpus_dir):
    from metacache_mpi_ray.stages.banding import compute_bands
    from metacache_mpi_ray.stages.candidates import bucket_edges, dedupe_edges
    from metacache_mpi_ray.stages.signatures import compute_signatures
    from metacache_mpi_ray.stages.verify import verify_edges

    docs = ingest_pages(rd.read_parquet(f"{corpus_dir}/pages"))
    sigs = compute_signatures(docs, CFG, batch_size=1024).materialize()
    edges = dedupe_edges(
        bucket_edges(
            compute_bands(sigs, CFG), ["band_id", "band_hash"], cap=CFG.bucket_cap
        ),
        num_partitions=4,
    ).materialize()
    vb = verify_edges(edges, sigs, CFG, strategy="broadcast").to_pandas()
    vj = verify_edges(edges, sigs, CFG, num_partitions=4, strategy="join").to_pandas()
    key = lambda df: sorted(zip(df["a"], df["b"]))
    assert key(vb) == key(vj)


def test_exact_jaccard_verification(corpus_dir):
    from metacache_mpi_ray.stages.banding import compute_bands
    from metacache_mpi_ray.stages.candidates import bucket_edges, dedupe_edges
    from metacache_mpi_ray.stages.signatures import compute_signatures
    from metacache_mpi_ray.stages.verify import verify_edges_exact_jaccard

    docs = ingest_pages(rd.read_parquet(f"{corpus_dir}/pages")).materialize()
    sigs = compute_signatures(docs, CFG, batch_size=1024).materialize()
    edges = dedupe_edges(
        bucket_edges(
            compute_bands(sigs, CFG), ["band_id", "band_hash"], cap=CFG.bucket_cap
        ),
        num_partitions=4,
    ).materialize()
    vx = verify_edges_exact_jaccard(edges, docs, CFG).to_pandas()
    assert len(vx) > 50
    assert (vx["jaccard"] >= CFG.sim_threshold).all()


def test_distributed_cluster_method_matches_driver(corpus_dir):
    docs = ingest_pages(rd.read_parquet(f"{corpus_dir}/pages")).materialize()
    d = near_dup_pipeline(docs, CFG, num_partitions=4, cluster_method="driver").clusters.to_pandas()
    x = near_dup_pipeline(docs, CFG, num_partitions=4, cluster_method="distributed").clusters.to_pandas()
    m = d.sort_values("doc_id").reset_index(drop=True)
    k = x.sort_values("doc_id").reset_index(drop=True)
    assert (m["cluster_id"].values == k["cluster_id"].values).all()
    assert (m["is_dup"].values == k["is_dup"].values).all()


def test_scored_substring_edges_estimates_shared_span():
    """A1 full analog: the contiguous-run score must track the TRUE
    longest-common-substring length on planted partial overlaps and
    stay silent on unrelated docs."""
    from metacache_mpi_ray.functions.text import normalize_text_py
    from metacache_mpi_ray.stages.ingest import ingest_documents
    from metacache_mpi_ray.stages.substring import (
        lcs_len_hashed,
        scored_substring_edges,
    )

    rng = np.random.default_rng(17)
    words = [f"w{i}" for i in range(600)]

    def mk(n):
        return " ".join(words[int(rng.integers(0, 600))] for _ in range(n))

    shared = mk(150)  # ~ 500+ chars shared span
    texts = {
        1: mk(120) + " " + shared + " " + mk(100),
        2: mk(90) + " " + shared + " " + mk(130),
        3: mk(200),   # unrelated
        4: mk(210),   # unrelated
    }
    tab = pa.table(
        {
            "doc_id": pa.array(list(texts), type=pa.int64()),
            "text": pa.array(list(texts.values()), type=pa.string()),
        }
    )
    docs = ingest_documents(rd.from_arrow(tab))
    out = scored_substring_edges(docs, CFG, num_partitions=4).to_pandas()
    # exactly the planted pair survives the min_match_len filter
    assert len(out) == 1
    assert (int(out["a"][0]), int(out["b"][0])) == (1, 2)
    exact = lcs_len_hashed(
        normalize_text_py(texts[1]).encode(), normalize_text_py(texts[2]).encode()
    )
    est = int(out["est_span"][0])
    # run-estimate brackets the true span: anchors under-cover the ends
    # by at most ~anchor_len + sampling slack each side, never overshoot
    # beyond one max_gap bridge
    assert exact >= CFG.min_match_len
    assert 0.6 * exact <= est <= 1.3 * exact


def test_anchor_ambiguity_filter_drops_cross_host_boilerplate():
    """D4 wired into the substring pipeline: a footer shared across
    many hosts must not produce candidate edges, while a genuine long
    match within one host still does."""
    from metacache_mpi_ray.stages.ingest import ingest_pages
    from metacache_mpi_ray.stages.substring import anchor_candidates

    rng = np.random.default_rng(21)
    words = [f"w{i}" for i in range(400)]

    def mk(n):
        return " ".join(words[int(rng.integers(0, 400))] for _ in range(n))

    footer = mk(60)          # boilerplate on every host
    shared = mk(120)         # genuine shared span, one host only
    pages = []
    for h in range(6):
        for p in range(2):
            body = mk(100)
            extra = (" " + shared) if (h == 0) else ""
            pages.append(
                (f"https://host{h}.example/p{p}", body + extra + " " + footer)
            )
    tab = pa.table(
        {
            "url": pa.array([u for u, _ in pages]),
            "html": pa.array([None] * len(pages), type=pa.binary()),
            "text": pa.array([t for _, t in pages], type=pa.string()),
        }
    )
    docs = ingest_pages(rd.from_arrow(tab)).materialize()
    loose = anchor_candidates(docs, CFG, num_partitions=4).to_pandas()
    strict = anchor_candidates(docs, CFG, num_partitions=4, max_hosts=3).to_pandas()
    # without the filter the footer connects docs across hosts
    assert len(loose) > len(strict)
    # the genuine pair on host0 (sharing `shared`) survives the filter
    ids = docs.to_pandas().set_index("url")["doc_id"]
    a, b = sorted([ids["https://host0.example/p0"], ids["https://host0.example/p1"]])
    assert ((strict["a"] == a) & (strict["b"] == b)).any()
    # and no strict edge links docs of different hosts
    host_of = {
        r["doc_id"]: r["url"].split("/")[2]
        for _, r in docs.to_pandas().iterrows()
    }
    assert all(host_of[r["a"]] == host_of[r["b"]] for _, r in strict.iterrows())


def test_scored_substring_pair_bridge_stitch():
    """pair_batch_size=1 splits EVERY anchor bucket into single-row
    fragments: round-2's per-fragment scoring emitted nothing; the
    bridge stitch must recover the full planted pair."""
    from metacache_mpi_ray.stages.ingest import ingest_documents
    from metacache_mpi_ray.stages.substring import scored_substring_edges

    rng = np.random.default_rng(23)
    words = [f"w{i}" for i in range(600)]

    def mk(n):
        return " ".join(words[int(rng.integers(0, 600))] for _ in range(n))

    shared = mk(150)
    tab = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array(
                [mk(80) + " " + shared, shared + " " + mk(70), mk(200)],
                type=pa.string(),
            ),
        }
    )
    docs = ingest_documents(rd.from_arrow(tab))
    base = scored_substring_edges(docs, CFG, num_partitions=4).to_pandas()
    tiny = scored_substring_edges(
        docs, CFG, num_partitions=4, pair_batch_size=1
    ).to_pandas()
    assert set(zip(tiny["a"], tiny["b"])) == set(zip(base["a"], base["b"])) == {(1, 2)}
    # spans come from the same stitched pair set -> identical estimate
    assert int(tiny["est_span"][0]) == int(base["est_span"][0])


def test_cluster_lcs_report_matches_pandas_reference_across_batch_sizes():
    """The sort+segment dispatch (round-3 rewrite of the map_groups
    version) must reproduce the per-cluster rep-vs-member LCS exactly,
    including clusters split across batch boundaries."""
    from metacache_mpi_ray.stages.substring import (
        cluster_lcs_report,
        lcs_len_hashed,
    )

    rng = np.random.default_rng(5)
    words = [f"w{i}" for i in range(200)]

    def mk(n):
        return " ".join(words[int(rng.integers(0, 200))] for _ in range(n))

    rows = []
    for cid in range(6):
        base = mk(40)
        for j in range(int(rng.integers(1, 5))):
            # member texts share a prefix with the rep
            rows.append((cid, cid * 100 + j, base[: len(base) - 5 * j] + " " + mk(6)))
    df = pd.DataFrame(rows, columns=["cluster_id", "doc_id", "norm_text"])

    # pandas reference
    want = set()
    for cid, g in df.groupby("cluster_id"):
        g = g.sort_values("doc_id").head(8)
        if len(g) < 2:
            continue
        rep = g.iloc[0]["norm_text"].encode()
        for _, r in g.iloc[1:].iterrows():
            want.add(
                (int(cid), int(r["doc_id"]), lcs_len_hashed(rep, r["norm_text"].encode()))
            )

    ds = rd.from_pandas(df.sample(frac=1.0, random_state=7))  # shuffled input
    for bs in (None, 3):
        got_df = cluster_lcs_report(ds, min_cluster=2, max_members=8, batch_size=bs)
        got = set(
            zip(*[got_df.to_pandas()[c] for c in ["cluster_id", "doc_id", "lcs_with_rep"]])
        )
        assert got == want, bs


def test_exact_jaccard_join_strategy_matches_broadcast(corpus_dir):
    from metacache_mpi_ray.stages.banding import compute_bands
    from metacache_mpi_ray.stages.candidates import bucket_edges, dedupe_edges
    from metacache_mpi_ray.stages.signatures import compute_signatures
    from metacache_mpi_ray.stages.verify import verify_edges_exact_jaccard

    docs = ingest_pages(rd.read_parquet(f"{corpus_dir}/pages")).materialize()
    sigs = compute_signatures(docs, CFG, batch_size=1024).materialize()
    edges = dedupe_edges(
        bucket_edges(
            compute_bands(sigs, CFG), ["band_id", "band_hash"], cap=CFG.bucket_cap
        ),
        num_partitions=4,
    ).materialize()
    vb = verify_edges_exact_jaccard(edges, docs, CFG, strategy="broadcast").to_pandas()
    vj = verify_edges_exact_jaccard(
        edges, docs, CFG, strategy="join", num_partitions=4
    ).to_pandas()
    kb = set(zip(vb["a"], vb["b"], vb["jaccard"].round(12)))
    kj = set(zip(vj["a"], vj["b"], vj["jaccard"].round(12)))
    assert kb == kj and len(kb) > 50


def test_emit_bucket_pairs_bridge_rows_bounded_and_stitch_exact():
    """r3 review regression: a hot anchor bucket at a batch boundary
    ships at most pair_cap bridge rows per fragment, and the capped
    bridge still stitches to the same pair set as shipping every row
    (both reduce through the same deterministic min-mix sampling)."""
    import numpy as np
    import pyarrow as pa

    from metacache_mpi_ray.stages.substring import (
        _emit_bucket_pairs,
        _pairs_from_group,
    )

    cap = 4
    n_hot = 100
    ids = np.arange(1, n_hot + 1, dtype=np.int64)
    pos = np.arange(n_hot, dtype=np.int64) * 3
    t = pa.table(
        {"anchor_hash": pa.array(np.full(n_hot, 77, dtype=np.int64)),
         "doc_id": pa.array(ids), "pos": pa.array(pos)}
    )
    out = _emit_bucket_pairs(cap)(t)
    bk = out["bridge_key"].to_numpy(zero_copy_only=False)
    n_bridge = int((bk != 0).sum())
    assert n_bridge <= cap  # single segment -> one capped fragment

    # stitch parity: pairs from the capped fragment == pairs from the
    # full member list (global sample is a subset of the capped union)
    bm = out.filter(pa.array(bk != 0))
    a_c, b_c, d_c, p_c = _pairs_from_group(
        bm["a"].to_numpy(zero_copy_only=False),
        bm["pos_a"].to_numpy(zero_copy_only=False), cap,
    )
    a_f, b_f, d_f, p_f = _pairs_from_group(ids, pos, cap)
    assert set(zip(a_c, b_c, d_c, p_c)) == set(zip(a_f, b_f, d_f, p_f))
def test_cap_sampling_rule_parity():
    """The bridge-row hot-bucket sample in _emit_bucket_pairs and the
    sample_cap branch of segment_all_pairs must pick the SAME members
    (the stitch-reassembly invariant rests on the two rules being
    byte-identical)."""
    from metacache_mpi_ray.functions.hashing import U64, splitmix64
    from metacache_mpi_ray.stages.candidates import segment_all_pairs

    rng = np.random.default_rng(5)
    ids = rng.choice(np.arange(1, 10_000_000), size=50, replace=False).astype(
        np.int64
    )
    pos = rng.integers(0, 1000, size=50).astype(np.int64)
    cap = 16
    # bridge-path rule (substring _emit_bucket_pairs lines ~290)
    mix = splitmix64(ids.view(U64))
    pick = np.argsort(mix, kind="stable")[:cap]
    bridge_members = set(ids[pick].tolist())
    # segment_all_pairs rule: run one over-cap segment and collect the
    # distinct endpoints of the emitted pairs
    a, b = segment_all_pairs(
        ids,
        np.zeros(1, dtype=np.int64),
        np.array([50], dtype=np.int64),
        np.ones(1, dtype=bool),
        sample_cap=cap,
    )
    seg_members = set(a.tolist()) | set(b.tolist())
    assert seg_members == bridge_members


def test_hot_sample_vectorized_matches_per_group_loop():
    """The segmented-lexsort hot-group sampler (r5, replaces the
    per-hot-group Python loop) must emit exactly the per-group
    cap-smallest-mixed-id star the loop produced — many hot groups of
    varying size in one batch, interleaved with in-cap groups."""
    import numpy as np

    from metacache_mpi_ray.functions.hashing import U64, splitmix64
    from metacache_mpi_ray.stages.candidates import _make_edge_emitter

    rng = np.random.default_rng(99)
    cap = 8
    keys, ids = [], []
    next_id = 1000
    group_sizes = [3, 40, 2, 25, 8, 100, 5, 60]  # mix of hot and in-cap
    for g, size in enumerate(group_sizes):
        members = rng.permutation(np.arange(next_id, next_id + size))
        keys += [g + 1] * size
        ids += list(members)
        next_id += size + 17
    t = pa.table(
        {
            "bkey": pa.array(np.array(keys, dtype=np.int64)),
            "doc_id": pa.array(np.array(ids, dtype=np.int64)),
        }
    )
    out = _make_edge_emitter("doc_id", cap, "sample")(t).to_pandas()
    edges = out[out["bridge_key"] == 0]
    got = set(zip(edges["a"], edges["b"]))

    # reference: per-group loop semantics
    expect = set()
    arr_k = np.array(keys)
    arr_i = np.array(ids, dtype=np.int64)
    for g, size in enumerate(group_sizes):
        grp = arr_i[arr_k == g + 1]
        if size > cap:
            mix = splitmix64(grp.view(U64))
            pick = grp[np.argsort(mix)[:cap]]
        elif size > 1:
            pick = grp
        else:
            continue
        m = pick.min()
        expect |= {(m, x) for x in pick if x != m}
    assert got == expect

"""extend_index — the reference's ``modify`` mode (add documents to an
existing database, /root/reference/src/mode_build.cpp:1114-1137).

The contract: build(A) then extend(B) produces the SAME cluster
partition as build(A ∪ B) on corpora where co-bucketing implies
near-identity (the planted token corpus — no verification-failing
candidate pairs, no over-cap buckets), including exact cluster_id
labels (min doc_id of the merged component) and is_dup flags.
"""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from metacache_mpi_ray.config import DedupConfig
from metacache_mpi_ray.pipelines.extend import (
    extend_index,
    resume_pending_extend,
)
from metacache_mpi_ray.pipelines.incremental import (
    build_index,
    query_against_index,
)
from metacache_mpi_ray.stages.ingest import ingest_documents
from metacache_mpi_ray.state.checkpoint import ConfigMismatch

CFG = DedupConfig()


def _token_docs(ids: np.ndarray, src_ids: np.ndarray | None = None):
    """doc i carries text 'tok<s> ' * 40 where s = src_ids[i] (defaults
    to i): distinct tokens share no 16-char shingles, equal tokens are
    exact duplicates — the SQL-reproducible planted relation."""
    src = src_ids if src_ids is not None else ids
    txt = np.char.multiply(np.char.add(np.char.add("tok", src.astype("U")), " "), 40)
    return ingest_documents(
        rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(ids, type=pa.int64()),
                    "text": pa.array(txt, type=pa.string()),
                }
            )
        )
    )


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values("doc_id").reset_index(drop=True)[
        ["doc_id", "cluster_id", "is_dup"]
    ]


@pytest.fixture()
def built_a(tmp_path):
    """Index over A = docs 0..99, where 3k and 3k+1 are duplicates
    (text of 3k), plus singletons."""
    ids = np.arange(100, dtype=np.int64)
    src = ids.copy()
    src[ids % 3 == 1] -= 1  # 3k+1 duplicates 3k
    root = str(tmp_path / "idx")
    docs = _token_docs(ids, src)
    build_index(docs, CFG, root, num_partitions=4)
    return root, ids, src


def _b_batch():
    """B: copies of stored docs 0, 3, 30 (merging into A clusters),
    one PAIR of new docs duplicating each other (both 'tokNN'), and
    fresh singletons."""
    b_ids = np.array([1000, 1003, 1030, 2000, 2001, 3000, 3001], dtype=np.int64)
    b_src = np.array([0, 3, 30, 777777, 777777, 888001, 999002], dtype=np.int64)
    return b_ids, b_src


def test_extend_matches_full_rebuild(built_a, tmp_path):
    root, a_ids, a_src = built_a
    b_ids, b_src = _b_batch()
    extended = extend_index(_token_docs(b_ids, b_src), root, CFG, num_partitions=4)
    got = _canon(extended.to_pandas())

    # the oracle: one build over A ∪ B
    u_ids = np.concatenate([a_ids, b_ids])
    u_src = np.concatenate([a_src, b_src])
    root2 = str(tmp_path / "rebuild")
    want = _canon(
        build_index(_token_docs(u_ids, u_src), CFG, root2, num_partitions=4)
        .to_pandas()
    )
    pd.testing.assert_frame_equal(got, want)
    # spot meaning: 1000 joined doc 0's cluster (min id 0); 2000/2001
    # cluster together at min 2000; 3000/3001 stay singletons
    by_id = got.set_index("doc_id")
    assert by_id.loc[1000, "cluster_id"] == 0
    assert by_id.loc[1003, "cluster_id"] == 3
    assert by_id.loc[2001, "cluster_id"] == 2000
    assert bool(by_id.loc[2000, "is_dup"]) and bool(by_id.loc[2001, "is_dup"])
    assert not by_id.loc[3000, "is_dup"] and by_id.loc[3000, "cluster_id"] == 3000
    # stored singleton 30 became a dup through the new copy
    assert bool(by_id.loc[30, "is_dup"]) and by_id.loc[30, "cluster_id"] == 30


def test_extend_chains_and_queries_see_new_docs(built_a):
    root, _, _ = built_a
    b_ids, b_src = _b_batch()
    extend_index(_token_docs(b_ids, b_src), root, CFG, num_partitions=4)
    # second batch: a copy of a FIRST-EXTEND doc (2000's text) must
    # resolve into the 2000-cluster — proves batch-1 artifacts are live
    c_ids = np.array([5000], dtype=np.int64)
    c_src = np.array([777777], dtype=np.int64)
    ext2 = extend_index(_token_docs(c_ids, c_src), root, CFG, num_partitions=4)
    by_id = _canon(ext2.to_pandas()).set_index("doc_id")
    assert by_id.loc[5000, "cluster_id"] == 2000
    assert len(by_id) == 100 + 7 + 1
    # lineage records both extensions
    with open(os.path.join(root, "extends.json")) as f:
        recs = json.load(f)
    assert [r["batch_id"] for r in recs] == ["b0001", "b0002"]
    assert recs[0]["n_new"] == 7 and recs[1]["n_new"] == 1
    # the incremental QUERY path probes the extended index too
    q = query_against_index(
        _token_docs(np.array([9000], dtype=np.int64),
                    np.array([777777], dtype=np.int64)),
        root,
        num_partitions=4,
    ).to_pandas()
    assert bool(q.loc[0, "matched"]) and q.loc[0, "matched_cluster_id"] == 2000


def test_extend_config_guard_and_batch_id_guard(built_a):
    root, _, _ = built_a
    other = DedupConfig(n_perms=CFG.n_perms, n_bands=CFG.n_bands // 2)
    with pytest.raises(ConfigMismatch):
        extend_index(_token_docs(np.array([1, 2])), root, other)
    b_ids, b_src = _b_batch()
    extend_index(
        _token_docs(b_ids, b_src), root, CFG, num_partitions=4, batch_id="x1"
    )
    with pytest.raises(ConfigMismatch):
        extend_index(
            _token_docs(b_ids + 50_000, b_src), root, CFG,
            num_partitions=4, batch_id="x1",
        )


def test_interrupted_commit_rolls_forward(built_a, monkeypatch):
    """A crash between journal write and installation must be healed by
    the next call, producing the same final state."""
    import metacache_mpi_ray.pipelines.extend as ext_mod

    root, a_ids, a_src = built_a
    b_ids, b_src = _b_batch()

    real_install = ext_mod._install_files
    calls = {"n": 0}

    def crash_once(r, j):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated crash before install")
        return real_install(r, j)

    monkeypatch.setattr(ext_mod, "_install_files", crash_once)
    with pytest.raises(RuntimeError, match="simulated crash"):
        extend_index(_token_docs(b_ids, b_src), root, CFG, num_partitions=4)
    # journal exists, nothing installed into signatures/ yet
    assert os.path.exists(os.path.join(root, "extend.commit.json"))
    monkeypatch.setattr(ext_mod, "_install_files", real_install)
    assert resume_pending_extend(root)
    assert not os.path.exists(os.path.join(root, "extend.commit.json"))
    # rolled-forward state == a clean extend's state
    got = _canon(
        rd.read_parquet(os.path.join(root, "clusters")).to_pandas()
    )
    by_id = got.set_index("doc_id")
    assert by_id.loc[1000, "cluster_id"] == 0
    assert by_id.loc[2001, "cluster_id"] == 2000
    assert len(got) == 107
    with open(os.path.join(root, "extends.json")) as f:
        assert json.load(f)[0]["n_new"] == 7


def test_extend_merges_old_clusters(tmp_path):
    """A new doc similar to TWO dissimilar stored docs must merge their
    clusters transitively (the contracted union-find's merge case —
    unreachable with exact-copy fixtures, where a new doc has one text).

    Triangle: a and b share no tokens; n = first half of a + first half
    of b, so jaccard(n,a) ~ jaccard(n,b) ~ 1/3 while jaccard(a,b) = 0.
    Config: 128 single-row bands (catches 1/3-similarity pairs with
    probability ~1) and threshold 0.2 (3+ sigma below the 1/3 estimate,
    so verification decisions are stable); extend and rebuild share
    signatures bit-for-bit, so their decisions agree pair-by-pair."""
    cfg = DedupConfig(n_perms=128, n_bands=128, sim_threshold=0.2)
    ta = " ".join(f"alpha{i}token" for i in range(400))
    tb = " ".join(f"bravo{i}token" for i in range(400))
    tn = (
        " ".join(f"alpha{i}token" for i in range(200))
        + " "
        + " ".join(f"bravo{i}token" for i in range(200))
    )
    singles = [f"solo{i}word " * 60 for i in range(5)]

    def docs(ids, texts):
        return ingest_documents(
            rd.from_arrow(
                pa.table(
                    {
                        "doc_id": pa.array(ids, type=pa.int64()),
                        "text": pa.array(texts, type=pa.string()),
                    }
                )
            )
        )

    a_ids = [1, 2, 10, 11, 12, 13, 14]
    a_txt = [ta, tb] + singles
    root = str(tmp_path / "idx")
    base = build_index(docs(a_ids, a_txt), cfg, root, num_partitions=4).to_pandas()
    base = base.set_index("doc_id")
    assert not base["is_dup"].any()  # a and b are NOT similar to each other

    got = _canon(
        extend_index(docs([100], [tn]), root, cfg, num_partitions=4).to_pandas()
    )
    root2 = str(tmp_path / "rebuild")
    want = _canon(
        build_index(
            docs(a_ids + [100], a_txt + [tn]), cfg, root2, num_partitions=4
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(got, want)
    by_id = got.set_index("doc_id")
    # the merge actually happened: a, b and n share one cluster (min id 1)
    assert by_id.loc[1, "cluster_id"] == 1
    assert by_id.loc[2, "cluster_id"] == 1
    assert by_id.loc[100, "cluster_id"] == 1
    assert bool(by_id.loc[2, "is_dup"])


def test_extend_bandless_legacy_index(built_a):
    """Extending an index without a persisted bands artifact (e.g. one
    written by run_dedup_checkpointed) must install a bands table that
    covers the STORED corpus too — installing only the batch's bands
    would silently hide the original corpus from every later probe."""
    import shutil

    root, a_ids, a_src = built_a
    shutil.rmtree(os.path.join(root, "bands"))
    os.remove(os.path.join(root, "bands.done"))
    b_ids, b_src = _b_batch()
    extend_index(_token_docs(b_ids, b_src), root, CFG, num_partitions=4)
    # the installed bands artifact covers stored + new docs
    bands = rd.read_parquet(os.path.join(root, "bands")).to_pandas()
    assert bands["doc_id"].nunique() == 100 + 7
    # a LATER probe still sees the original corpus: query a copy of
    # stored doc 30's text
    q = query_against_index(
        _token_docs(np.array([7000], dtype=np.int64),
                    np.array([30], dtype=np.int64)),
        root,
        num_partitions=4,
    ).to_pandas()
    assert bool(q.loc[0, "matched"]) and q.loc[0, "matched_cluster_id"] == 30
    # and a SECOND extend keeps matching stored docs too
    ext2 = extend_index(
        _token_docs(np.array([8000], dtype=np.int64),
                    np.array([3], dtype=np.int64)),
        root, CFG, num_partitions=4,
    )
    by_id = _canon(ext2.to_pandas()).set_index("doc_id")
    assert by_id.loc[8000, "cluster_id"] == 3


@pytest.mark.parametrize("seed", [11, 37])
def test_extend_parity_randomized(tmp_path, seed):
    """Randomized structures: dup groups of size 1-6 with members split
    arbitrarily between the base corpus and the extend batch (including
    batch-only groups -> pure new x new dups, and base-only groups that
    the extension must leave untouched). build(A)+extend(B) must equal
    build(A∪B) exactly."""
    rng = np.random.default_rng(seed)
    ids, srcs, side = [], [], []
    next_id = 1
    for g in range(40):
        size = int(rng.integers(1, 7))
        src = 10_000 + g
        members = []
        for _ in range(size):
            members.append(next_id)
            next_id += int(rng.integers(1, 9))
        split = rng.random(size) < 0.4  # ~40% of members arrive via extend
        if size == 1 and rng.random() < 0.5:
            split[:] = True  # some batch-only singletons too
        for m, in_b in zip(members, split):
            ids.append(m)
            srcs.append(src)
            side.append(bool(in_b))
    ids = np.array(ids, dtype=np.int64)
    srcs = np.array(srcs, dtype=np.int64)
    side = np.array(side)
    if not (~side).any():  # base must exist to build an index over
        side[0] = False

    root = str(tmp_path / f"idx{seed}")
    build_index(_token_docs(ids[~side], srcs[~side]), CFG, root, num_partitions=4)
    got = _canon(
        extend_index(
            _token_docs(ids[side], srcs[side]), root, CFG, num_partitions=4
        ).to_pandas()
    )
    root2 = str(tmp_path / f"rebuild{seed}")
    want = _canon(
        build_index(_token_docs(ids, srcs), CFG, root2, num_partitions=4)
        .to_pandas()
    )
    pd.testing.assert_frame_equal(got, want)


def test_extended_root_refuses_manifest_pinned_resume(built_a, tmp_path):
    """A one-shot checkpointed run (manifest-pinned inputs) must refuse
    to resume from a root that extend_index mutated afterwards."""
    from metacache_mpi_ray.state.checkpoint import init_checkpoint_root

    root, _, _ = built_a
    b_ids, b_src = _b_batch()
    extend_index(_token_docs(b_ids, b_src), root, CFG, num_partitions=4)
    some_file = str(tmp_path / "in.parquet")
    open(some_file, "w").close()
    with pytest.raises(ConfigMismatch, match="extended"):
        init_checkpoint_root(root, CFG, input_files=[some_file])
    # build_index-style use (no manifest) keeps working
    init_checkpoint_root(root, CFG)


def test_extend_empty_batch_is_noop(built_a):
    root, a_ids, _ = built_a
    before = _canon(
        rd.read_parquet(os.path.join(root, "clusters")).to_pandas()
    )
    out = extend_index(
        _token_docs(np.array([], dtype=np.int64)), root, CFG, num_partitions=4
    )
    pd.testing.assert_frame_equal(_canon(out.to_pandas()), before)
    assert not os.path.exists(os.path.join(root, "extends.json"))


def test_extend_records_phase_timings(built_a):
    """Each extend appends one metrics.jsonl row with per-phase wall
    times (r4 verdict item 6: the sorted-staging cost must be visible
    in telemetry, not re-derived from bench deltas)."""
    root, _, _ = built_a
    b_ids = np.arange(3000, 3020, dtype=np.int64)
    extend_index(_token_docs(b_ids), root, CFG, num_partitions=4,
                 batch_id="phase-timing")
    rows = [
        json.loads(l)
        for l in open(os.path.join(root, "metrics.jsonl"))
        if l.strip()
    ]
    ext = [r for r in rows if r["stage"] == "extend_index"]
    assert ext, "no extend_index telemetry row"
    ph = ext[-1]["phases"]
    assert {"sign_sort_stage", "band_stage", "probe_verify", "contract",
            "rewrite_clusters", "commit"} <= set(ph)
    assert ext[-1]["n_new"] == 20
    assert abs(sum(ph.values()) - ext[-1]["seconds"]) < 1.5

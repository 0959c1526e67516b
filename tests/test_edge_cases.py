"""Degenerate inputs: empty corpus, empty/short texts, single doc."""

import pyarrow as pa
import ray.data as rd

from metacache_mpi_ray.config import DedupConfig
from metacache_mpi_ray.pipelines.dedup import near_dup_pipeline
from metacache_mpi_ray.stages.ingest import ingest_documents

CFG = DedupConfig()


def _docs(texts):
    return ingest_documents(
        rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts, type=pa.string()),
                }
            )
        )
    )


def test_empty_corpus():
    res = near_dup_pipeline(_docs([]), CFG, num_partitions=2)
    assert res.clusters.count() == 0
    assert res.verified_edges.count() == 0


def test_single_doc():
    cl = near_dup_pipeline(_docs(["just one document here"]), CFG, num_partitions=2).clusters.to_pandas()
    assert len(cl) == 1
    assert not cl["is_dup"].iloc[0]
    assert cl["cluster_id"].iloc[0] == cl["doc_id"].iloc[0]


def test_short_and_empty_texts():
    texts = ["", "a", "ab", "x" * 5, "a normal length document " * 10, "", "a"]
    cl = near_dup_pipeline(_docs(texts), CFG, num_partitions=2).clusters.to_pandas()
    assert len(cl) == len(texts)
    m = cl.set_index("doc_id")["cluster_id"]
    # identical short texts (whole-text fallback shingle) cluster together
    assert m[0] == m[5]  # both ""
    assert m[1] == m[6]  # both "a"
    assert m[0] != m[1]


def test_all_identical_docs():
    texts = ["the same exact document body repeated " * 5] * 20
    cl = near_dup_pipeline(_docs(texts), CFG, num_partitions=2).clusters.to_pandas()
    assert cl["cluster_id"].nunique() == 1
    assert cl["is_dup"].all()


def test_outputs_writers(tmp_path):
    import json
    import os

    from metacache_mpi_ray.pipelines.outputs import (
        cluster_summary,
        write_clusters,
        write_run_report,
    )

    texts = ["duplicate body here " * 10] * 3 + ["unique doc " + str(i) * 30 for i in range(4)]
    res = near_dup_pipeline(_docs(texts), CFG, num_partitions=2)
    out = write_clusters(res.clusters, str(tmp_path / "cl"), only_dups=True)
    import pyarrow.parquet as pq

    written = pq.read_table(out).to_pandas()
    assert len(written) == 3 and written["is_dup"].all()

    summ = cluster_summary(res.clusters).to_pandas()
    assert summ["n_members"].max() == 3

    rep = write_run_report(res.clusters, str(tmp_path / "rep"))
    assert rep["n_docs"] == 7 and rep["n_dups"] == 3
    assert rep["size_histogram"][3] == 1
    assert json.load(open(tmp_path / "rep" / "report.json"))["n_docs"] == 7


def test_kperm_scheme_end_to_end():
    """The classic k-permutation scheme (reference-shaped) must cluster
    exact and near duplicates just like the OPH default."""
    from metacache_mpi_ray.config import DedupConfig

    toks = [f"tok{i:03d}" for i in range(300)]
    base = " ".join(toks)
    near = " ".join(toks[:150] + ["CHANGED"] + toks[151:])  # 1-token edit
    texts = [base, base, near, "entirely other content " * 12]
    cfg = DedupConfig(minhash_scheme="kperm")
    cl = near_dup_pipeline(_docs(texts), cfg, num_partitions=2).clusters.to_pandas()
    m = cl.set_index("doc_id")["cluster_id"]
    assert m[0] == m[1] == m[2]
    assert m[3] != m[0]
def test_windows_family_empty_input():
    """Every windowed operator must return an empty result (not crash)
    on an empty event table — Ray's sort of an empty dataset loses the
    schema, which used to break the post-sort schema lookups."""
    from ray.data.aggregate import Count

    from metacache_mpi_ray.stages.windows import (
        collect_members,
        hopping_window_agg,
        lag_per_group,
        quantile_per_group,
        sessionize,
        topk_per_group,
        tumbling_window_agg,
    )

    ev = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([], type=pa.int64()),
                "ts": pa.array([], type=pa.int64()),
                "val": pa.array([], type=pa.float64()),
            }
        )
    )
    assert topk_per_group(ev, "user_id", "val", 3).count() == 0
    assert lag_per_group(ev, "user_id", "ts", "val").count() == 0
    assert sessionize(ev, "user_id", "ts").count() == 0
    assert collect_members(ev, "user_id", "ts").count() == 0
    assert quantile_per_group(ev, "user_id", "val", 0.5).count() == 0
    assert hopping_window_agg(ev, "user_id", "ts", 100, 50, [Count(alias_name="n")]).count() == 0
    assert tumbling_window_agg(ev, "user_id", "ts", 100, [Count(alias_name="n")]).count() == 0


def test_run_report_empty_clusters(tmp_path):
    from metacache_mpi_ray.pipelines.outputs import write_run_report

    empty = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "cluster_id": pa.array([], type=pa.int64()),
                "is_dup": pa.array([], type=pa.bool_()),
            }
        )
    )
    rep = write_run_report(empty, str(tmp_path))
    assert rep == {"n_docs": 0, "n_dups": 0, "dup_rate": 0.0, "size_histogram": {}}


def test_private_cache_dir_owned_and_0700(tmp_path, monkeypatch):
    """The synthesized-input caches (textfile/qidx/extidx/ivf) share one
    per-user directory that must be owner-only even when an attacker
    pre-creates the predictable name (r4 ADVICE item 5)."""
    import os
    import stat
    import tempfile

    from metacache_mpi_ray.pipelines.queries import _private_cache_dir

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))

    d = _private_cache_dir()
    assert d == str(tmp_path / f"metacache-{os.getuid()}")
    st = os.lstat(d)
    assert stat.S_ISDIR(st.st_mode)
    assert st.st_uid == os.getuid()
    assert not (st.st_mode & 0o077)  # no group/other access

    # second call reuses the validated dir
    assert _private_cache_dir() == d

    # attacker pre-created the name with open permissions: the helper
    # must refuse it and fall back to a fresh private mkdtemp
    os.chmod(d, 0o777)
    fallback = _private_cache_dir()
    assert fallback != d
    st2 = os.lstat(fallback)
    assert st2.st_uid == os.getuid()
    assert not (st2.st_mode & 0o077)

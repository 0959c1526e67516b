"""Incremental query-against-persisted-index dedup — the analog of the
reference's query mode: build once, query many.

Reference shape: ``mode_query.cpp:404-455`` loads the per-rank DB
artifact (``dbfile_<rank>``) and streams new reads against it via the
multimap probe ``sketch_database.h:804-833`` (accumulate_matches),
bounded by the maxcand candidate list. This is THE daily operation of a
training-data pipeline: dedup a new crawl batch against the existing
corpus index without re-processing the corpus.

Ray-Data shape: the persisted artifacts are the signature and cluster
Parquet checkpoints written by ``build_index`` (or by
``pipelines/checkpointed.run_dedup_checkpointed`` — same layout). The
query side re-derives LSH bands from the stored signatures (cheap
reshape+hash; at extreme scale persist the bands too), hash-joins new
bands against stored bands on the folded band key, verifies candidate
pairs against the union of signatures, and resolves each matched new
doc to the minimum matched stored cluster.

doc_ids must be disjoint between the index corpus and the query batch
(ids are content-derived hashes of distinct urls in the ingest path).
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Count, Min

from metacache_mpi_ray.config import DedupConfig
from metacache_mpi_ray.stages.banding import compute_bands
from metacache_mpi_ray.stages.candidates import _combine_keys, bucket_edges, dedupe_edges
from metacache_mpi_ray.stages.cluster import assign_clusters
from metacache_mpi_ray.stages.signatures import compute_signatures
from metacache_mpi_ray.stages.verify import lookup_sorted, verify_edges
from metacache_mpi_ray.state.checkpoint import (
    ConfigMismatch,
    checkpointed_stage,
    init_checkpoint_root,
)


def build_index(
    docs,
    cfg: DedupConfig,
    ckpt_root: str,
    *,
    num_partitions: int = 16,
):
    """Dedup ``docs`` and persist the queryable artifacts under
    ``ckpt_root`` (signatures/, edges/, verified/, clusters/ +
    config.json guard). Returns the clusters dataset. Resumable: a
    finished stage is read back instead of recomputed."""
    init_checkpoint_root(ckpt_root, cfg)
    sigs = checkpointed_stage(
        ckpt_root,
        "signatures",
        lambda: compute_signatures(docs, cfg, batch_size=128),
    )
    edge_schema = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("n_bands_hit", pa.int64())]
    )
    edges = checkpointed_stage(
        ckpt_root,
        "edges",
        empty_schema=edge_schema,
        compute=lambda: dedupe_edges(
            bucket_edges(
                compute_bands(sigs, cfg),
                key_cols=["band_id", "band_hash"],
                id_col="doc_id",
                cap=cfg.bucket_cap,
                num_partitions=num_partitions,
            ),
            num_partitions=num_partitions,
        ),
    )
    verified = checkpointed_stage(
        ckpt_root,
        "verified",
        empty_schema=pa.schema(
            [("a", pa.int64()), ("b", pa.int64()), ("est_sim", pa.float64())]
        ),
        compute=lambda: verify_edges(edges, sigs, cfg, num_partitions=num_partitions),
    )
    return checkpointed_stage(
        ckpt_root, "clusters", lambda: assign_clusters(sigs, verified)
    )


def load_index_config(ckpt_root: str) -> DedupConfig:
    with open(os.path.join(ckpt_root, "config.json")) as f:
        return DedupConfig.from_json(f.read())


def _read_stage(ckpt_root: str, stage: str, columns=None):
    """Read a stage checkpoint as an explicit sorted file list (avoids
    hive-partition inference over the sharded shard=K layout)."""
    files = sorted(
        glob.glob(os.path.join(ckpt_root, stage, "**", "*.parquet"), recursive=True)
    )
    if not files:
        raise FileNotFoundError(f"no checkpointed stage {stage!r} under {ckpt_root}")
    return rd.read_parquet(files, columns=columns)


def _band_keys(sigs, cfg: DedupConfig, id_out: str):
    """signatures -> (bkey, <id_out>) rows, band key folded to one u64."""
    bands = compute_bands(sigs, cfg)
    return bands.map_batches(
        lambda t: _combine_keys(t, ["band_id", "band_hash"], "doc_id"),
        batch_format="pyarrow",
    ).rename_columns({"doc_id": id_out})


def query_against_index(
    new_docs,
    ckpt_root: str,
    cfg: DedupConfig | None = None,
    *,
    num_partitions: int = 16,
):
    """Stream a new batch of canonical docs against a persisted index.

    Returns (doc_id, matched, matched_cluster_id) per new doc:
    ``matched`` iff some stored doc clears the similarity threshold;
    ``matched_cluster_id`` = the minimum matched stored cluster id, or
    -1. The index corpus itself is never re-signed or re-clustered.
    """
    stored_cfg = load_index_config(ckpt_root)
    if cfg is not None and cfg != stored_cfg:
        raise ConfigMismatch(
            f"index at {ckpt_root} was built with a different DedupConfig; "
            "signatures are not comparable across configs"
        )
    cfg = stored_cfg

    sigs_idx = _read_stage(ckpt_root, "signatures", columns=["doc_id", "sig"])
    sigs_new = compute_signatures(new_docs, cfg, batch_size=128).materialize()

    bands_idx = _band_keys(sigs_idx, cfg, "idx_id")
    bands_new = _band_keys(sigs_new, cfg, "new_id")

    # overpopulated-feature removal on the index side (the reference
    # clears hot features at build, sketch_database.h:398-417): hot band
    # buckets are non-discriminative boilerplate and would blow up the
    # join fan-out. The hot-key list is small by construction (each key
    # held > cap rows), so it broadcasts.
    hot = (
        bands_idx.groupby("bkey")
        .aggregate(Count(alias_name="n"))
        .filter(expr=f"n > {cfg.bucket_cap}")
    )
    hot_df = hot.to_pandas()  # empty result loses schema -> guard
    hot_keys = (
        np.sort(hot_df["bkey"].to_numpy(dtype=np.int64))
        if len(hot_df)
        else np.empty(0, dtype=np.int64)
    )
    if len(hot_keys):
        hot_ref = ray.put(hot_keys)

        def drop_hot(t: pa.Table) -> pa.Table:
            hk = ray.get(hot_ref)
            keys = t["bkey"].to_numpy(zero_copy_only=False)
            _, found = lookup_sorted(hk, keys)
            return t.filter(pa.array(~found))

        bands_idx = bands_idx.map_batches(drop_hot, batch_format="pyarrow")

    # the probe: hash-join new bands against stored bands on the band
    # key — the shuffle-by-feature form of accumulate_matches
    j = bands_new.join(
        bands_idx, join_type="inner", num_partitions=num_partitions, on=("bkey",)
    )
    pairs = (
        j.select_columns(["new_id", "idx_id"])
        .groupby(["new_id", "idx_id"])
        .aggregate(Count(alias_name="n_bands_hit"))
        .rename_columns({"new_id": "a", "idx_id": "b"})
        .materialize()
    )

    sigs_all = sigs_new.select_columns(["doc_id", "sig"]).union(sigs_idx)
    verified = verify_edges(
        pairs, sigs_all, cfg, num_partitions=num_partitions
    ).materialize()

    # matched stored docs -> their cluster ids: broadcast-pick the
    # matched subset of the clusters checkpoint (dup-subset pattern)
    matched_idx = np.unique(
        np.concatenate(
            [
                b["b"].to_numpy(zero_copy_only=False)
                for b in verified.iter_batches(batch_size=262144, batch_format="pyarrow")
            ]
            or [np.empty(0, dtype=np.int64)]
        )
    )
    clusters_idx = _read_stage(ckpt_root, "clusters", columns=["doc_id", "cluster_id"])
    mref = ray.put(matched_idx)

    def pick(t: pa.Table) -> pa.Table:
        w = ray.get(mref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        _, found = lookup_sorted(w, ids)
        return t.filter(pa.array(found))

    sub = clusters_idx.map_batches(pick, batch_format="pyarrow").to_pandas()
    idx_sorted = sub["doc_id"].to_numpy(dtype=np.int64)
    order = np.argsort(idx_sorted)
    idx_sorted = idx_sorted[order]
    idx_cluster = sub["cluster_id"].to_numpy(dtype=np.int64)[order]
    cref = ray.put((idx_sorted, idx_cluster))

    def to_cluster(t: pa.Table) -> pa.Table:
        ids_s, cl = ray.get(cref)
        b = t["b"].to_numpy(zero_copy_only=False)
        pos, found = lookup_sorted(ids_s, b)
        out = np.where(found, cl[pos], b)  # stored doc absent from
        # clusters artifact (shouldn't happen) -> fall back to its own id
        return pa.table(
            {
                "new_id": t["a"].cast(pa.int64()),
                "cluster_id": pa.array(out, type=pa.int64()),
            }
        )

    match_tbl = (
        verified.map_batches(to_cluster, batch_format="pyarrow")
        .groupby("new_id")
        .aggregate(Min("cluster_id", alias_name="matched_cluster_id"))
        .to_pandas()
    )
    m_ids = match_tbl["new_id"].to_numpy(dtype=np.int64)
    order = np.argsort(m_ids)
    m_ids = m_ids[order]
    m_cl = match_tbl["matched_cluster_id"].to_numpy(dtype=np.int64)[order]
    lref = ray.put((m_ids, m_cl))

    def finish(t: pa.Table) -> pa.Table:
        ids_s, cl = ray.get(lref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        pos, found = lookup_sorted(ids_s, ids)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "matched": pa.array(found, type=pa.bool_()),
                "matched_cluster_id": pa.array(
                    np.where(found, cl[pos], -1), type=pa.int64()
                ),
            }
        )

    return new_docs.map_batches(finish, batch_format="pyarrow")

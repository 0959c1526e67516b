"""End-to-end near-duplicate detection pipeline (the flagship).

docs -> MinHash signatures -> LSH bands -> bucket star-edges (capped)
     -> cross-band edge dedup -> signature verification -> union-find
     -> clusters(doc_id, cluster_id, is_dup)

Stage-by-stage mapping to the reference is documented in each stage
module; the lifecycle mirrors /root/reference build+query fused into one
streaming job (SURVEY.md §3, §7.1).
"""

from __future__ import annotations

from dataclasses import dataclass

import ray.data

from metacache_mpi_ray.config import DedupConfig
from metacache_mpi_ray.stages.banding import compute_bands
from metacache_mpi_ray.stages.candidates import bucket_edges, dedupe_edges
from metacache_mpi_ray.stages.cluster import assign_clusters
from metacache_mpi_ray.stages.signatures import compute_signatures
from metacache_mpi_ray.stages.verify import verify_edges


@dataclass
class DedupResult:
    signatures: "ray.data.Dataset"
    verified_edges: "ray.data.Dataset"
    clusters: "ray.data.Dataset"


def near_dup_pipeline(
    docs: "ray.data.Dataset",
    cfg: DedupConfig | None = None,
    *,
    num_partitions: int | None = None,
    signer_concurrency: int | None = None,
    include_substring: bool = False,
    dedupe_pairs: bool = False,
    cluster_method: str = "auto",
    cluster_driver_edge_limit: int = 50_000_000,
) -> DedupResult:
    """Run the full MinHash/LSH dedup over a canonical ``docs`` dataset.

    ``signatures`` is materialized once (it is consumed by both the
    banding stage and the verification joins — the analog of the
    reference's persisted per-rank DB artifact, SURVEY.md S9/S10); at
    checkpointed scale it is written to Parquet instead (see
    state/checkpoint.py).
    """
    from metacache_mpi_ray.stages.joins import default_num_partitions

    cfg = cfg or DedupConfig()
    if num_partitions is None:
        num_partitions = default_num_partitions()
    # coalesce the signer output to ~num_partitions blocks inside the
    # same execution: the read stage typically hands down hundreds of
    # row-group-sized blocks, and every downstream pass inherits that
    # count — Ray's sort shuffles with one sample + one reduce partition
    # PER INPUT BLOCK, so the banding sort over 208 tiny blocks measured
    # 5.3 s against 1.0 s over 32 coalesced blocks (same rows, matched
    # healthy-probe A/B at 120k docs). At real scale the caller sizes
    # num_partitions to the cluster, which keeps blocks near the
    # object-store target size instead of row-group crumbs.
    sigs = (
        compute_signatures(docs, cfg, concurrency=signer_concurrency, batch_size=128)
        .repartition(num_partitions)
        .materialize()
    )
    bands = compute_bands(sigs, cfg)
    raw_edges = bucket_edges(
        bands,
        key_cols=["band_id", "band_hash"],
        id_col="doc_id",
        cap=cfg.bucket_cap,
        num_partitions=num_partitions,
    )
    # cross-band pair dedup is OPTIONAL: union-find is idempotent and
    # the vectorized verification costs ~nothing per extra row, so the
    # groupby(a,b) shuffle only pays off when verified edges feed a
    # consumer that needs unique pairs (e.g. pair exports). Skipping it
    # is ~35% faster end-to-end with identical clusters.
    edges = (
        dedupe_edges(raw_edges, num_partitions=num_partitions).materialize()
        if dedupe_pairs
        else raw_edges
    )
    # the final cluster-assignment pass only needs doc_id, but mapping
    # over the full-width signature blocks pays per-block executor
    # overhead for ~nothing (measured ~2 s of a 44 s 2-CPU run). Build
    # a doc_id-only, few-block projection CONCURRENTLY with the verify
    # execution (independent datasets; Ray schedules both), so the
    # assignment pass at the end touches a ~16-bytes/row dataset in a
    # handful of blocks instead.
    import threading

    ids_holder: dict = {}

    def _project_ids():
        try:
            ids_holder["ds"] = (
                sigs.select_columns(["doc_id"])
                .repartition(max(4, num_partitions // 8))
                .materialize()
            )
        except Exception:  # fall back to assigning over sigs directly
            import logging

            logging.getLogger(__name__).warning(
                "doc_id projection failed; cluster assignment will map "
                "over the full-width signature blocks",
                exc_info=True,
            )

    ids_thread = threading.Thread(target=_project_ids, daemon=True)
    ids_thread.start()
    # auto strategy: verify_edges sizes the actual broadcast payload
    # (distinct edge endpoints x signature width) and falls back to the
    # two-hash-join path only when the dup subset outgrows one object —
    # at web-scale dup rates the broadcast would otherwise become a
    # driver-memory scale-killer
    # pre_deduped ONLY when dedupe_pairs actually ran: with the default
    # dedupe_pairs=False the edges carry raw per-band multiplicity, and
    # claiming them distinct makes the join fallback attach a 1 KB
    # signature payload to EVERY raw edge row — at 4M docs (>2M distinct
    # endpoints, past the broadcast limit) that re-created the measured
    # >50 GB spill the _dedupe_and_prune guard exists to prevent
    # (r5 evidence-suite incident; the 120k bench hides it because its
    # endpoint set broadcasts)
    verified = verify_edges(
        edges, sigs, cfg, num_partitions=num_partitions, strategy="auto",
        pre_deduped=dedupe_pairs,
    ).materialize()
    if include_substring:
        # exact long-match substring edges (suffix/anchor stage, F6
        # analog): docs sharing an exact span >= ~min_match_len are
        # duplicates even when whole-doc Jaccard is below threshold
        from metacache_mpi_ray.stages.substring import substring_dup_edges

        sub_edges = substring_dup_edges(
            docs, cfg, num_partitions=num_partitions
        ).materialize()

        def strip(t):
            import numpy as _np
            import pyarrow as _pa

            return _pa.table(
                {
                    "a": t["a"],
                    "b": t["b"],
                    "est_sim": _pa.array(
                        _np.full(len(t), 1.0), type=_pa.float64()
                    ),
                }
            )

        verified = verified.union(
            sub_edges.map_batches(strip, batch_format="pyarrow")
        ).materialize()
    # assign over the materialized signatures (same doc_id set as docs);
    # re-running the ingest lineage just to read doc_id would re-parse
    # the whole input a second time.
    # cluster_method: "driver" = DSU over the streamed edge list +
    # broadcast labels (edges are small after verification);
    # "distributed" = min-label propagation + hash join (the scale path
    # when the dup subset outgrows one process); "auto" picks by the
    # materialized verified-edge count.
    # the driver DSU streams the edge list once (vectorized pointer
    # jumping, ~16 bytes/edge resident) — switch to distributed
    # min-label propagation only when even that outgrows one process
    if cluster_method == "auto":
        cluster_method = (
            "driver"
            if verified.count() <= cluster_driver_edge_limit
            else "distributed"
        )
    ids_thread.join()
    assign_src = ids_holder.get("ds", sigs)
    if cluster_method == "distributed":
        from metacache_mpi_ray.stages.cluster import assign_clusters_distributed

        clusters = assign_clusters_distributed(
            assign_src, verified, num_partitions=num_partitions
        )
    else:
        clusters = assign_clusters(assign_src, verified)
    return DedupResult(signatures=sigs, verified_edges=verified, clusters=clusters)


def dedup_clusters(docs, cfg: DedupConfig | None = None, **kw) -> "ray.data.Dataset":
    return near_dup_pipeline(docs, cfg, **kw).clusters

"""Formatted output sinks — the analog of the reference's per-read /
per-target / abundance writers (S11-S12: /root/reference/src/
classification.cpp:521-632, printing.cpp:117-517): configurable-column
cluster outputs plus grouped summary artifacts, written as partitioned
Parquet/CSV directories (never one giant file — resumable layout).
"""

from __future__ import annotations

import os

import pyarrow as pa

from ray.data.aggregate import Count, Max, Min


def write_clusters(
    clusters,
    out_dir: str,
    *,
    fmt: str = "parquet",
    columns: list[str] | None = None,
    only_dups: bool = False,
):
    """Write the clusters dataset (optionally projected / dup-only).

    Mirrors the reference's column-configurable mapping output
    (query_options.h:167-242: separator/column toggles) in Parquet/CSV
    form; returns the output directory."""
    ds = clusters
    if only_dups:
        ds = ds.map_batches(
            lambda t: t.filter(t["is_dup"]), batch_format="pyarrow"
        )
    if columns:
        ds = ds.select_columns(columns)
    os.makedirs(out_dir, exist_ok=True)
    if fmt == "csv":
        ds.write_csv(out_dir)
    else:
        ds.write_parquet(out_dir)
    return out_dir


def cluster_summary(clusters):
    """Per-cluster roll-up (size, id range) — the per-target summary
    analog (printing.cpp:437-517), one groupby."""
    return clusters.groupby("cluster_id").aggregate(
        Count(alias_name="n_members"),
        Min("doc_id", alias_name="min_doc"),
        Max("doc_id", alias_name="max_doc"),
    )


def write_run_report(clusters, out_dir: str):
    """Summary artifact: totals + cluster-size histogram (abundance
    output analog, classification.cpp:362-428)."""
    import json

    summary = cluster_summary(clusters)
    hist = (
        summary.groupby("n_members")
        .aggregate(Count(alias_name="n_clusters"))
        .to_pandas()
    )
    from metacache_mpi_ray.functions.blocks import ensure_columns

    # empty clusters: the empty groupby loses its schema on to_pandas()
    hist = ensure_columns(hist, ["n_members", "n_clusters"]).sort_values("n_members")
    n_docs = clusters.count()
    n_dups = clusters.map_batches(
        lambda t: pa.table({"d": t["is_dup"]}), batch_format="pyarrow"
    ).sum("d")
    n_dups = n_dups or 0  # sum() is None on an empty dataset
    os.makedirs(out_dir, exist_ok=True)
    report = {
        "n_docs": int(n_docs),
        "n_dups": int(n_dups),
        "dup_rate": round(float(n_dups) / max(1, n_docs), 6),
        "size_histogram": {
            int(r["n_members"]): int(r["n_clusters"]) for _, r in hist.iterrows()
        },
    }
    tmp = os.path.join(out_dir, "report.json.tmp")
    with open(tmp, "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, "report.json"))
    return report

"""Scale soak driver: checkpointed index build + crash-resume + pruned
incremental query at N docs (default 1M), with bracketing CPU probes so
the numbers are attributable on the throttled sandbox (BASELINE.md
methodology).

Usage: python tools/soak.py [n_docs] [--root DIR]

Phases (each timed, probes before/after the suite):
  1. cold build_index into a fresh checkpoint root (all artifacts:
     doc_id-sorted signatures, bands, edges, verified, clusters)
  2. crash simulation: delete the marker of a mid-pipeline stage and
     re-run build_index — only that stage and its dependents recompute
     (resume evidence at soak scale, r3 verdict item 5)
  3. warm full resume (everything cached) — should be ~seconds
  4. query_against_index of a 10% batch (50% copies / 50% fresh),
     reporting the telemetry row incl. sig_files_read vs total (the
     footer-pruning A/B)
"""
import json
import os
import shutil
import sys
import time

n_docs = 1_000_000
root = None
args = sys.argv[1:]
while args:
    a = args.pop(0)
    if a == "--root":
        root = args.pop(0)
    elif a.isdigit():
        n_docs = int(a)

root = root or f"/tmp/metacache_soak_idx_{n_docs}"

sys.path.insert(0, "/root/repo")
from bench import _corpus_dir, _cpu_probe  # noqa: E402

import ray  # noqa: E402

ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
         include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext  # noqa: E402

DataContext.get_current().enable_progress_bars = False

import ray.data as rd  # noqa: E402

from metacache_mpi_ray.config import DedupConfig  # noqa: E402
from metacache_mpi_ray.pipelines.incremental import (  # noqa: E402
    build_index,
    query_against_index,
)
from metacache_mpi_ray.stages.ingest import ingest_pages  # noqa: E402

out: dict = {"n_docs": n_docs, "cpus": int(ray.cluster_resources()["CPU"])}
out["probe_start"] = round(_cpu_probe(), 3)

corpus = _corpus_dir(n_docs)
cfg = DedupConfig()
num_partitions = 32


def docs_ds():
    return ingest_pages(
        rd.read_parquet(f"{corpus}/pages", columns=["url", "html", "text"])
    )


if os.path.exists(root):
    shutil.rmtree(root)

t0 = time.perf_counter()
clusters = build_index(docs_ds(), cfg, root, num_partitions=num_partitions)
n_rows = clusters.count()
out["cold_build_sec"] = round(time.perf_counter() - t0, 2)
out["clusters_rows"] = n_rows

# crash simulation: lose the verified stage mid-run; resume must reuse
# signatures+bands+edges and recompute only verified+clusters
for stage in ("verified", "clusters"):
    for p in (os.path.join(root, f"{stage}.done"), os.path.join(root, stage)):
        if os.path.isdir(p):
            shutil.rmtree(p)
        elif os.path.exists(p):
            os.remove(p)
t0 = time.perf_counter()
clusters2 = build_index(docs_ds(), cfg, root, num_partitions=num_partitions)
n2 = clusters2.count()
out["resume_from_verified_sec"] = round(time.perf_counter() - t0, 2)
assert n2 == n_rows, (n2, n_rows)

t0 = time.perf_counter()
n3 = build_index(docs_ds(), cfg, root, num_partitions=num_partitions).count()
out["warm_full_resume_sec"] = round(time.perf_counter() - t0, 2)
assert n3 == n_rows

# query batch: 10% of corpus size — half exact copies, half alien
import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402

nq = max(1000, n_docs // 10)
half = nq // 2
pages = (
    rd.read_parquet(f"{corpus}/pages", columns=["url", "text", "html"])
    .limit(half)
    .to_pandas()
)
texts = [
    t if t is not None else (h or "")
    for t, h in zip(pages["text"], pages["html"])
]
fresh = [f"zzqx{i} wvnm{i} " * 50 for i in range(nq - half)]
batch = pa.table(
    {
        "doc_id": pa.array(
            np.arange(nq, dtype=np.int64) + 10_000_000_000, type=pa.int64()
        ),
        "text": pa.array(texts + fresh, type=pa.string()),
    }
)
from metacache_mpi_ray.stages.ingest import ingest_documents  # noqa: E402

t0 = time.perf_counter()
res = query_against_index(
    ingest_documents(rd.from_arrow(batch).repartition(16)),
    root,
    num_partitions=num_partitions,
).to_pandas()
out["query_sec"] = round(time.perf_counter() - t0, 2)
out["query_rows"] = len(res)
out["query_matched"] = int(res["matched"].sum())

# pruning telemetry from the probe's metrics row
with open(os.path.join(root, "metrics.jsonl")) as f:
    rows = [json.loads(l) for l in f if '"query_probe"' in l]
out["probe_telemetry"] = {
    k: rows[-1][k]
    for k in (
        "n_candidate_pairs", "n_verified", "n_matched_new_docs",
        "sig_files_read", "sig_files_total", "status",
    )
}
out["probe_end"] = round(_cpu_probe(), 3)
print(json.dumps(out))
ray.shutdown()

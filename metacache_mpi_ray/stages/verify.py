"""Candidate-pair verification — the analog of the reference's
hit-counting / top-k candidate filter (/root/reference/src/candidates.h:
118-289): LSH gives candidates, a similarity check keeps real ones.

Similarity is estimated as the fraction of agreeing MinHash values
between the two signatures (an unbiased estimator of Jaccard with
sigma ~= sqrt(s(1-s)/n_perms) ~= 0.044 at 128 perms); pairs with
``est_sim >= cfg.verify_threshold`` (threshold minus a noise margin)
survive.

Two strategies (auto-selected by edge count):

* ``broadcast`` — the duplicate subset is small relative to the corpus:
  semi-join the signatures down to doc_ids appearing in any edge, pull
  that subset into one object, ``ray.put`` it once, and score edges in
  map_batches with a vectorized searchsorted lookup. No shuffle of the
  big side (the broadcast-small-side join pattern, SURVEY.md §2.4 J2).
* ``join`` — scale fallback when the edge list is too big to broadcast:
  two hash joins against the signatures table (signatures packed as
  binary payloads; Arrow hash join can't carry list columns).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from metacache_mpi_ray.config import DedupConfig
from metacache_mpi_ray.stages.signatures import sig_from_arrow


def lookup_sorted(sorted_ids: np.ndarray, ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(positions, found_mask) of ``ids`` in ``sorted_ids``; positions
    are clamped so callers can gather safely and must mask by ``found``
    — verify_edges is a public API and may be handed edges whose
    endpoints are absent from the signature set."""
    if len(sorted_ids) == 0:
        return np.zeros(len(ids), dtype=np.int64), np.zeros(len(ids), dtype=bool)
    pos = np.minimum(np.searchsorted(sorted_ids, ids), len(sorted_ids) - 1)
    return pos, sorted_ids[pos] == ids


def _edge_doc_ids(edges) -> np.ndarray:
    ids: list[np.ndarray] = []
    for b in edges.iter_batches(batch_size=262144, batch_format="pyarrow"):
        ids.append(b["a"].to_numpy(zero_copy_only=False))
        ids.append(b["b"].to_numpy(zero_copy_only=False))
    if not ids:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(ids))


def _collect_sig_subset(signatures, wanted: np.ndarray, n_perms: int):
    """(sorted_ids, sig_matrix) for the wanted doc_ids, streamed."""
    ref = ray.put(wanted)

    def pick(batch: pa.Table) -> pa.Table:
        w = ray.get(ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        if len(w) == 0:
            mask = np.zeros(len(ids), dtype=bool)
        else:
            pos = np.minimum(np.searchsorted(w, ids), len(w) - 1)
            mask = w[pos] == ids
        return batch.filter(pa.array(mask))

    sub = signatures.select_columns(["doc_id", "sig"]).map_batches(
        pick, batch_format="pyarrow"
    )
    ids_out, sig_out = [], []
    for b in sub.iter_batches(batch_size=65536, batch_format="pyarrow"):
        ids_out.append(b["doc_id"].to_numpy(zero_copy_only=False))
        sig_out.append(sig_from_arrow(b["sig"]))
    if not ids_out:
        return np.empty(0, dtype=np.int64), np.empty((0, n_perms), dtype=np.uint64)
    ids_all = np.concatenate(ids_out)
    sig_all = np.concatenate(sig_out, axis=0)
    order = np.argsort(ids_all)
    return ids_all[order], sig_all[order]


def verify_edges(
    edges,
    signatures,
    cfg: DedupConfig,
    num_partitions: int = 32,
    *,
    strategy: str = "auto",
    broadcast_bytes_limit: int = 2 << 30,
):
    """edges(a, b, ...) x signatures(doc_id, sig) -> (a, b, est_sim) for
    pairs whose estimated Jaccard clears the verification threshold.

    ``auto`` decides by the actual broadcast payload — the dup-subset
    signature matrix (#distinct endpoints x n_perms x 8 bytes) — not by
    raw edge count: edges over-count the subset by the per-pair band
    multiplicity, and the join fallback costs two full hash shuffles of
    the signature table, so it should engage only when the subset
    genuinely can't ride in one broadcast object."""
    if strategy == "auto":
        wanted = _edge_doc_ids(edges)
        if len(wanted) * cfg.n_perms * 8 <= broadcast_bytes_limit:
            return _verify_broadcast(edges, signatures, cfg, wanted=wanted)
        return _verify_join(edges, signatures, cfg, num_partitions)
    if strategy == "broadcast":
        return _verify_broadcast(edges, signatures, cfg)
    return _verify_join(edges, signatures, cfg, num_partitions)


def _verify_broadcast(edges, signatures, cfg: DedupConfig, wanted=None):
    if wanted is None:
        wanted = _edge_doc_ids(edges)
    ids_sorted, sig_mat = _collect_sig_subset(signatures, wanted, cfg.n_perms)
    lookup_ref = ray.put((ids_sorted, sig_mat))
    thresh = cfg.verify_threshold

    def score(batch: pa.Table) -> pa.Table:
        ids_s, sigs = ray.get(lookup_ref)
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        ia, fa = lookup_sorted(ids_s, a)
        ib, fb = lookup_sorted(ids_s, b)
        est = (sigs[ia] == sigs[ib]).mean(axis=1) if len(a) else np.empty(0)
        # endpoints without a signature are dropped, not mis-scored
        keep = (est >= thresh) & fa & fb
        return pa.table(
            {
                "a": pa.array(a[keep], type=pa.int64()),
                "b": pa.array(b[keep], type=pa.int64()),
                "est_sim": pa.array(est[keep], type=pa.float64()),
            }
        )

    return edges.map_batches(score, batch_format="pyarrow")


def verify_edges_exact_jaccard(edges, docs, cfg: DedupConfig):
    """Exact n-gram Jaccard verification of candidate pairs: the
    endpoint texts (dup subset) are shingled once and broadcast as
    sorted-hash sets; each edge computes true |A∩B| / |A∪B| with a
    vectorized sorted-array intersection. The precision-grade
    alternative to MinHash-estimated verification (used when cluster
    purity matters more than a second pass over the dup subset)."""
    from metacache_mpi_ray.functions.hashing import (
        arrow_string_buffer,
        shingle_hashes_from_buffer,
    )

    wanted = _edge_doc_ids(edges)
    wref = ray.put(wanted)

    def pick(batch: pa.Table) -> pa.Table:
        w = ray.get(wref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        if len(w) == 0:
            mask = np.zeros(len(ids), dtype=bool)
        else:
            pos = np.minimum(np.searchsorted(w, ids), len(w) - 1)
            mask = w[pos] == ids
        return batch.filter(pa.array(mask))

    sub = docs.select_columns(["doc_id", "norm_text"]).map_batches(
        pick, batch_format="pyarrow"
    )
    sets: dict[int, np.ndarray] = {}
    for b in sub.iter_batches(batch_size=8192, batch_format="pyarrow"):
        data, starts, ends = arrow_string_buffer(b["norm_text"])
        h, offs = shingle_hashes_from_buffer(data, starts, ends, cfg.shingle_k, cfg.seed)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        for i, d in enumerate(ids.tolist()):
            sets[d] = np.unique(h[offs[i] : offs[i + 1]])
    sets_ref = ray.put(sets)
    thresh = cfg.sim_threshold

    def score(batch: pa.Table) -> pa.Table:
        ss = ray.get(sets_ref)
        a = batch["a"].to_numpy(zero_copy_only=False)
        b_ = batch["b"].to_numpy(zero_copy_only=False)
        sims = np.empty(len(a), dtype=np.float64)
        # per-edge work is inherent to exact Jaccard (each edge owns a
        # distinct set pair, all bounded by the dup subset); the sets
        # are stored unique-sorted, so membership counting is one
        # searchsorted pass — no per-edge re-sorting
        for i in range(len(a)):
            sa, sb = ss.get(int(a[i])), ss.get(int(b_[i]))
            if sa is None or sb is None or len(sa) == 0 or len(sb) == 0:
                sims[i] = 0.0
                continue
            if len(sa) > len(sb):
                sa, sb = sb, sa
            pos = np.searchsorted(sb, sa)
            pos = np.minimum(pos, len(sb) - 1)
            inter = int(np.count_nonzero(sb[pos] == sa))
            sims[i] = inter / (len(sa) + len(sb) - inter) if inter else 0.0
        keep = sims >= thresh
        return pa.table(
            {
                "a": pa.array(a[keep], type=pa.int64()),
                "b": pa.array(b_[keep], type=pa.int64()),
                "jaccard": pa.array(sims[keep], type=pa.float64()),
            }
        )

    return edges.map_batches(score, batch_format="pyarrow")


def _verify_join(edges, signatures, cfg: DedupConfig, num_partitions: int):
    from metacache_mpi_ray.stages.signatures import sig_from_binary, sig_to_binary

    def pack(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sigbin": sig_to_binary(sig_from_arrow(batch["sig"])),
            }
        )

    sigs = signatures.select_columns(["doc_id", "sig"]).map_batches(
        pack, batch_format="pyarrow"
    )
    sa = sigs.rename_columns({"doc_id": "a", "sigbin": "sig_a"})
    sb = sigs.rename_columns({"doc_id": "b", "sigbin": "sig_b"})
    j = edges.join(sa, join_type="inner", num_partitions=num_partitions, on=("a",))
    j = j.join(sb, join_type="inner", num_partitions=num_partitions, on=("b",))

    thresh = cfg.verify_threshold
    n_perms = cfg.n_perms

    def score(batch: pa.Table) -> pa.Table:
        A = sig_from_binary(batch["sig_a"], n_perms)
        B = sig_from_binary(batch["sig_b"], n_perms)
        est = (A == B).mean(axis=1) if len(A) else np.empty(0)
        keep = est >= thresh
        return pa.table(
            {
                "a": batch["a"].filter(pa.array(keep)),
                "b": batch["b"].filter(pa.array(keep)),
                "est_sim": pa.array(est[keep], type=pa.float64()),
            }
        )

    return j.map_batches(score, batch_format="pyarrow")

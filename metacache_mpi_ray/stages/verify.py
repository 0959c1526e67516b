"""Candidate-pair verification — the analog of the reference's
hit-counting / top-k candidate filter (/root/reference/src/candidates.h:
118-289): LSH gives candidates, a similarity check keeps real ones.

Similarity is estimated as the fraction of agreeing MinHash values
between the two signatures (an unbiased estimator of Jaccard with
sigma ~= sqrt(s(1-s)/n_perms) ~= 0.044 at 128 perms); pairs with
``est_sim >= cfg.verify_threshold`` (threshold minus a noise margin)
survive.

Distribution: two hash joins of the (small) edge list against the
signatures table. At 10^12-doc scale the signature side should first be
semi-joined down to doc_ids that appear in any edge (the dup subset);
at sandbox scale the join handles it directly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from metacache_mpi_ray.config import DedupConfig
from metacache_mpi_ray.stages.signatures import sig_from_arrow


def verify_edges(edges, signatures, cfg: DedupConfig, num_partitions: int = 32):
    """edges(a, b, ...) x signatures(doc_id, sig) -> (a, b, est_sim) for
    pairs whose estimated Jaccard clears the verification threshold."""
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

"""Candidate-edge generation from LSH buckets — the shuffle at the heart
of the engine.

Reference analog: the query-side multimap probe + location-list merge
(`accumulate_matches`, /root/reference/src/sketch_database.h:804-833)
combined with the build-side insert — re-expressed as ONE groupby on the
band key (SURVEY.md §4: ship records through a shuffle keyed by sketch
features instead of shipping queries to every index shard).

Semantics per bucket (band_id, band_hash):
  * buckets larger than ``cap`` are dropped entirely — the analog of the
    reference's overpopulated-feature removal / uint8 location cap
    (/root/reference/src/sketch_database.h:356-417, config.h:77); such
    buckets are non-discriminative boilerplate and are hot keys;
  * surviving buckets emit star edges (min_doc_id, other_doc_id) —
    |bucket|-1 edges preserve connectivity for union-find without the
    O(m^2) pair explosion (SURVEY.md §7.3).

Implementation: groupby(key).aggregate(Min, Count) gives the global
per-bucket representative and size with vectorized partial aggregation,
then a hash join attaches them back to every bucket member. Both the
groupby and the join hash-partition on the same key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Min


def bucket_edges(
    ds,
    key_cols: list[str],
    id_col: str = "doc_id",
    cap: int = 256,
    num_partitions: int = 32,
):
    """rows(key_cols..., id_col) -> unique candidate edges (a < b).

    ``a`` is always the bucket minimum, so edges are canonically ordered
    and ready for cross-band dedup.
    """
    mins = ds.groupby(key_cols).aggregate(
        Min(id_col, alias_name="gmin"),
        Count(alias_name="gsize"),
    )
    joined = ds.join(
        mins, join_type="inner", num_partitions=num_partitions, on=tuple(key_cols)
    )

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        gmin = batch["gmin"].to_numpy(zero_copy_only=False)
        gsize = batch["gsize"].to_numpy(zero_copy_only=False)
        keep = (gsize <= cap) & (ids != gmin)
        return pa.table(
            {
                "a": pa.array(gmin[keep], type=pa.int64()),
                "b": pa.array(ids[keep], type=pa.int64()),
            }
        )

    return joined.map_batches(emit, batch_format="pyarrow")


def dedupe_edges(edges, num_partitions: int = 32):
    """Collapse the same (a, b) edge found in multiple bands; keep the
    number of agreeing bands as a signal column ``n_bands_hit``."""
    return edges.groupby(["a", "b"]).aggregate(Count(alias_name="n_bands_hit"))


def bucket_stats(ds, key_cols: list[str]):
    """Feature-frequency census (analog of A8: the distributed
    feature-count census that costs ~230 lines of MPI in the reference,
    /root/reference/src/mode_build.cpp:847-1074 — here one groupby)."""
    return ds.groupby(key_cols).aggregate(Count(alias_name="bucket_size"))

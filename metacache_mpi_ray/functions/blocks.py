"""Block-level dataset utilities.

``drop_empty_blocks`` works around a Ray 2.49 hash-shuffle quirk: join /
groupby operators emit zero-row blocks carrying the operator's INTERNAL
schema (the join's pre-projection columns, or no columns at all).
Projections skip empty blocks, so the stowaways survive select/rename
and later poison an acero join whose partition sees only them
("No match ... for key field reference"). Pruning by block ref is
metadata-only — no data moves.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd


def drop_empty_blocks(mat, schema: pa.Schema | None = None):
    """Prune zero-row blocks from a MATERIALIZED dataset.

    Returns a dataset over only the non-empty block refs. If EVERY
    block is empty, returns an empty single-block dataset with
    ``schema`` — pass the expected Arrow schema whenever the input
    came through a hash-shuffle projection, because in the all-empty
    case ``mat.schema()`` reports the very stowaway schema this
    function exists to discard. Without ``schema`` the fallback is
    ``mat.schema()`` (fine for inputs whose kernels emit typed empty
    tables, e.g. map_batches stages with explicit empty branches).
    """
    refs = [
        ref
        for bundle in mat.iter_internal_ref_bundles()
        for ref, meta in zip(bundle.block_refs, bundle.metadata)
        if meta.num_rows
    ]
    if not refs:
        if schema is None:
            got = mat.schema()
            if got is None:
                # e.g. the materialized sort of an empty dataset has
                # ZERO blocks and no schema at all — without the
                # caller-supplied fallback there is nothing to build
                raise ValueError(
                    "drop_empty_blocks: dataset has no blocks and no "
                    "schema; pass the expected schema explicitly"
                )
            schema = got.base_schema
        return rd.from_arrow(schema.empty_table())
    return rd.from_arrow_refs(refs)


def ensure_columns(df, columns: list[str]):
    """pandas frame with at least ``columns`` — the empty result of a
    Ray groupby/aggregate loses its schema on ``to_pandas()`` (zero-row
    shuffle blocks carry the operator's internal schema, or none), so
    every driver-side consumer of a possibly-empty grouped table
    rebuilds the expected columns through this ONE helper."""
    if all(c in df.columns for c in columns):
        return df
    return df.reindex(columns=columns)


def assemble_sorted_i64(mat, col: str):
    """ObjectRef to the sorted int64 numpy array of ``col`` over a
    MATERIALIZED dataset, assembled in ONE off-driver task from the
    block refs — the values never cross the driver heap. The shared
    broadcast-set builder for the boilerplate / decontamination /
    verify families."""
    import numpy as np

    import ray

    refs = [
        ref
        for bundle in mat.iter_internal_ref_bundles()
        for ref, meta in zip(bundle.block_refs, bundle.metadata)
        if meta.num_rows
    ]
    if not refs:
        return ray.put(np.empty(0, dtype=np.int64))

    @ray.remote
    def _assemble(*tabs):
        parts = [
            t[col].to_numpy(zero_copy_only=False) for t in tabs if len(t)
        ]
        return (
            np.sort(np.concatenate(parts).astype(np.int64))
            if parts
            else np.empty(0, dtype=np.int64)
        )

    return _assemble.remote(*refs)

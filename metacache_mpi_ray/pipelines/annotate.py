"""Annotate mode — the end-to-end analog of the reference's
``mode_annotate`` (/root/reference/src/mode_annotate.cpp:238-311):
stream records, look up an annotation for each record's key in a
mapping loaded once, and rewrite the record's header line in place.

Ray-Data shape: the mapping is a small dimension table broadcast via
``ray.put`` (read once per task, never reshuffled — J2); the rewrite is
a vectorized Arrow string concat inside ``map_batches``. The big side
streams; nothing materializes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray


def annotate_docs(
    docs,
    mapping: "pd.DataFrame",
    *,
    on: str,
    annotation_col: str,
    header_cols: list[str],
    out_col: str = "header",
    sep: str = "|",
    missing: str = "NA",
):
    """Annotate ``docs`` with ``mapping[annotation_col]`` looked up on
    ``on`` and build ``out_col`` = header_cols + annotation joined by
    ``sep`` (the reference writes ``>old_header | annotation`` FASTA
    lines; here the header is assembled from any record columns).

    Keys absent from the mapping annotate as ``missing`` — the
    reference's unmapped-sequence behavior (mode_annotate.cpp keeps the
    record and reports the miss count)."""
    small = mapping[[on, annotation_col]].copy()
    # one annotation per key (reference semantics): a duplicate-keyed
    # mapping would expand rows in the left merge and fail the batch
    # column append with an opaque Arrow length error
    if small[on].duplicated().any():
        dups = small[on][small[on].duplicated()].head(3).tolist()
        raise ValueError(
            f"annotate mapping has duplicate keys in {on!r} (e.g. {dups}); "
            "one annotation per key is required"
        )
    # stringify annotations up front: a left-merge miss would otherwise
    # promote int annotations to float ("3" -> "3.0")
    small[annotation_col] = small[annotation_col].astype(str)
    ref = ray.put(small)

    def rewrite(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        keys = batch[on].to_pandas()
        ann = (
            pd.merge(
                pd.DataFrame({on: keys}), m, on=on, how="left", sort=False
            )[annotation_col]
            .fillna(missing)
        )
        parts = [pc.cast(batch[c], pa.string()) for c in header_cols]
        parts.append(pa.array(ann.to_numpy(dtype=object), type=pa.string()))
        header = pc.binary_join_element_wise(*parts, sep)
        return batch.append_column(out_col, header)

    return docs.map_batches(rewrite, batch_format="pyarrow")


def annotate_counts(docs, *, key_col: str, header_cols: list[str], **kw):
    """Self-annotation convenience: annotate every doc with the number
    of docs sharing its ``key_col`` value (per-group census as the
    mapping), then rewrite headers. The grouped census is distributed;
    only the per-key counts table (small by construction) reaches the
    driver for broadcast."""
    from ray.data.aggregate import Count

    counts = docs.groupby(key_col).aggregate(Count(alias_name="n_key")).to_pandas()
    counts["n_key"] = counts["n_key"].astype(np.int64)
    return annotate_docs(
        docs,
        counts,
        on=key_col,
        annotation_col="n_key",
        header_cols=header_cols,
        **kw,
    )

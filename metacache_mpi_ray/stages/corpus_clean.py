"""Corpus-level text-cleaning operators for LLM training-data pipelines.

Three operators a web-scale training corpus needs (RefinedWeb / CCNet /
Gopher style) that sit beside the dedup family:

* ``remove_boilerplate_lines`` — corpus-wide line-frequency dedup:
  lines appearing in >= ``min_docs`` distinct documents (cookie
  banners, nav bars, copyright footers) are removed from every
  document. Structurally this is the reference's overpopulated-feature
  removal (/root/reference/src/sketch_database.h:356-417 and the
  distributed census at mode_build.cpp:847-1074: census -> threshold ->
  broadcast removal set) with a literal text line as the feature, and
  it reuses the same Ray Data shape as the band census: partial counts
  inside ``map_batches``, ONE groupby-sum shuffle, then a
  broadcast-vs-join auto switch for the removal set.
* ``redact_pii_batch`` — vectorized RE2 scrubbing of emails / phone
  numbers (Arrow ``replace_substring_regex``; DuckDB's regexp engine is
  RE2 too, so the oracle patterns are byte-identical).
* ``repetition_stats_batch`` — within-document duplicate-line signals
  (the Gopher repetition rules family): lines identical to an earlier
  line of the same document, counted and sized.

Scale notes: the census never materializes the exploded line table —
within-batch (row, line) dedup happens in numpy before the ONE
sort("line_hash") shuffle (sort + per-block segment sums + fragment
stitch; measured 4x faster than groupby-aggregate at 4M partial rows),
so the shuffled table is one row per
distinct (batch, line), not per line occurrence. The removal set is
broadcast when ``count * 8 bytes`` fits ``broadcast_limit`` (boilerplate
vocabularies are small by construction — a line must repeat across
``min_docs`` docs to qualify); otherwise the filter runs as a
hash-partitioned anti-join over the exploded lines with a sort+segment
reassembly (same fragment-stitch machinery as stages/windows.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from metacache_mpi_ray.functions.hashing import (
    arrow_string_buffer,
    doc_hashes_from_buffer,
)

LINE_SEED = 41

# RE2 patterns, shared verbatim with the DuckDB oracles (both engines
# are RE2; keep these free of single quotes so they embed in SQL).
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+?[0-9][0-9() -]{6,}[0-9]"


def _to_i63(u64: np.ndarray) -> np.ndarray:
    return (u64 >> np.uint64(1)).astype(np.int64)


def _split_lines(col):
    """('\n'-split of a string column) -> (flat_lines, sizes_per_row).

    ``flat_lines`` is a plain (32-bit offset) string Array — cast down
    from large_string because ``binary_join`` has no large_list kernel;
    per-batch flat volume is far below the int32 offset bound.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # null text -> "" (one empty line), matching the repo-wide
    # null-hashes-as-empty convention; without this the null list's
    # NaN length wraps to INT64_MIN and np.repeat crashes
    col = pc.fill_null(col, "")
    lst = pc.split_pattern(col, "\n")
    flat = pc.list_flatten(lst)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    if pa.types.is_large_string(flat.type):
        flat = flat.cast(pa.string())
    sizes = pc.list_value_length(lst).to_numpy(zero_copy_only=False).astype(np.int64)
    return flat, sizes


def _line_hashes(flat, seed: int = LINE_SEED) -> np.ndarray:
    """63-bit content hash per line, zero-copy from the Arrow buffer."""
    if len(flat) == 0:
        return np.empty(0, dtype=np.int64)
    data, starts, ends = arrow_string_buffer(flat)
    return _to_i63(doc_hashes_from_buffer(data, starts, ends, seed))


def line_census(docs, *, text_col: str = "text", seed: int = LINE_SEED):
    """(line_hash, n_docs) over the corpus — distinct-document counts.

    Exact (not approximate): each batch emits one row per distinct
    (document, line) — a document is never split across batch rows —
    so summing per-batch partials counts each (doc, line) once.

    The merge is a sort + per-block segment sum with boundary-fragment
    stitching, NOT a groupby-aggregate: measured 34 s -> ~8 s at 200k
    docs x 26 lines (4.2M partial rows) — the same sort-beats-hash
    finding as the flagship's band shuffle.
    """

    def partial(t: pa.Table) -> pa.Table:
        flat, sizes = _split_lines(t[text_col])
        h = _line_hashes(flat, seed)
        row = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
        if len(h):
            order = np.lexsort((row, h))  # primary: hash, secondary: doc
            hs, rs = h[order], row[order]
            first = np.empty(len(hs), dtype=bool)
            first[0] = True
            first[1:] = (hs[1:] != hs[:-1]) | (rs[1:] != rs[:-1])
            hf = hs[first]  # still sorted by hash
            change = np.empty(len(hf), dtype=bool)
            if len(hf):
                change[0] = True
                change[1:] = hf[1:] != hf[:-1]
            starts = np.flatnonzero(change)
            uh = hf[starts]
            cnt = np.diff(np.concatenate([starts, [len(hf)]]))
        else:
            uh = np.empty(0, dtype=np.int64)
            cnt = np.empty(0, dtype=np.int64)
        return pa.table(
            {
                "line_hash": pa.array(uh, type=pa.int64()),
                "nd": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    from metacache_mpi_ray.stages.windows import _split_frag

    empty = pa.table(
        {
            "line_hash": pa.array([], type=pa.int64()),
            "n_docs": pa.array([], type=pa.int64()),
        }
    )
    sorted_ds = (
        docs.map_batches(partial, batch_format="pyarrow")
        .sort("line_hash")
        .materialize()
    )
    if sorted_ds.count() == 0:
        return rd.from_arrow(empty)

    def ksum(t: pa.Table) -> pa.Table:
        h = t["line_hash"].to_numpy(zero_copy_only=False)
        v = t["nd"].to_numpy(zero_copy_only=False)
        n = len(h)
        if n == 0:
            return empty.append_column("__frag", pa.array([], type=pa.bool_()))
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = h[1:] != h[:-1]
        starts = np.flatnonzero(change)
        sums = np.add.reduceat(v, starts)
        frag = np.zeros(len(starts), dtype=bool)
        frag[0] = True
        frag[-1] = True
        return pa.table(
            {
                "line_hash": pa.array(h[starts], type=pa.int64()),
                "n_docs": pa.array(sums.astype(np.int64), type=pa.int64()),
                "__frag": pa.array(frag, type=pa.bool_()),
            }
        )

    final, frags = _split_frag(
        sorted_ds.map_batches(ksum, batch_format="pyarrow", batch_size=None),
        ["line_hash", "n_docs"],
    )
    if len(frags):
        agg = (
            frags.groupby("line_hash", sort=False)["n_docs"]
            .sum()
            .reset_index()
        )
        final = final.union(
            rd.from_arrow(
                pa.Table.from_pandas(
                    agg[["line_hash", "n_docs"]], preserve_index=False
                ).cast(
                    pa.schema(
                        [
                            pa.field("line_hash", pa.int64()),
                            pa.field("n_docs", pa.int64()),
                        ]
                    )
                )
            )
        )
    return final


def _is_in_sorted(sorted_vals: np.ndarray, vals: np.ndarray) -> np.ndarray:
    if len(sorted_vals) == 0 or len(vals) == 0:
        return np.zeros(len(vals), dtype=bool)
    pos = np.searchsorted(sorted_vals, vals)
    pos_c = np.minimum(pos, len(sorted_vals) - 1)
    return (pos < len(sorted_vals)) & (sorted_vals[pos_c] == vals)


def remove_boilerplate_lines(
    docs,
    *,
    min_docs: int = 30,
    text_col: str = "text",
    id_col: str = "doc_id",
    strategy: str = "auto",
    broadcast_limit: int = 256 << 20,
    num_partitions: int | None = None,
    seed: int = LINE_SEED,
):
    """Remove lines occurring in >= ``min_docs`` distinct documents.

    Returns (doc_id, clean_text, n_kept, n_removed): the document with
    hot lines dropped (original line order preserved, '\n'-rejoined; ''
    when every line was removed) plus kept/removed line counts.

    ``strategy``: 'broadcast' ships the sorted hot-hash array via the
    object store (assembled in ONE off-driver task from the census
    block refs — the hashes never cross the driver heap); 'join' runs a
    hash-partitioned left-outer join of the exploded lines against the
    hot table and reassembles with a sort + segment kernel; 'auto'
    picks by removal-set size (count x 8 bytes vs ``broadcast_limit``).

    ``docs`` is consumed TWICE (line census + rewrite) and is
    corpus-sized, so it is NOT materialized here; its lineage must be
    deterministic across executions (parquet reads + map_batches are;
    ``limit`` over a parallel read or an unseeded sample is not —
    materialize such inputs first, or the census and the rewrite see
    different rows).
    """
    if strategy not in ("auto", "broadcast", "join"):
        raise ValueError(
            f"strategy must be 'auto', 'broadcast' or 'join', got {strategy!r}"
        )
    hot_raw = line_census(docs, text_col=text_col, seed=seed).filter(
        expr=f"n_docs >= {int(min_docs)}"
    )
    # prune hash-shuffle stowaway blocks (see functions/blocks.py)
    from metacache_mpi_ray.functions.blocks import drop_empty_blocks

    hot_schema = pa.schema(
        [pa.field("line_hash", pa.int64()), pa.field("n_docs", pa.int64())]
    )
    hot_mat = drop_empty_blocks(hot_raw.materialize(), hot_schema).materialize()
    n_hot = hot_mat.count()

    if n_hot == 0:
        # nothing to remove: pass-through (and an empty join side would
        # crash the Ray 2.49 hash join anyway)
        def passthrough(t: pa.Table) -> pa.Table:
            _, sizes = _split_lines(t[text_col])
            txt = t[text_col]
            if isinstance(txt, pa.ChunkedArray):
                txt = txt.combine_chunks()
            if pa.types.is_large_string(txt.type):
                txt = txt.cast(pa.string())
            return pa.table(
                {
                    "doc_id": t[id_col].cast(pa.int64()),
                    "clean_text": txt,
                    "n_kept": pa.array(sizes, type=pa.int64()),
                    "n_removed": pa.array(
                        np.zeros(len(sizes), dtype=np.int64), type=pa.int64()
                    ),
                }
            )

        return docs.map_batches(passthrough, batch_format="pyarrow")

    if strategy == "broadcast" or (
        strategy == "auto" and n_hot * 8 <= broadcast_limit
    ):
        from metacache_mpi_ray.functions.blocks import assemble_sorted_i64

        hot_ref = assemble_sorted_i64(hot_mat, "line_hash")

        def clean(t: pa.Table) -> pa.Table:
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            flat, sizes = _split_lines(t[text_col])
            h = _line_hashes(flat, seed)
            hot = ray.get(hot_ref)  # zero-copy shared-memory read
            keep = ~_is_in_sorted(hot, h)
            row = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
            n_kept = np.bincount(
                row[keep], minlength=len(sizes)
            ).astype(np.int64)
            idx = np.flatnonzero(keep)
            vals = flat.take(pa.array(idx, type=pa.int64()))
            offsets = np.concatenate(
                [np.zeros(1, dtype=np.int64), np.cumsum(n_kept)]
            )
            lst = pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()), vals
            )
            return pa.table(
                {
                    "doc_id": pa.array(ids, type=pa.int64()),
                    "clean_text": pc.binary_join(lst, "\n"),
                    "n_kept": pa.array(n_kept, type=pa.int64()),
                    "n_removed": pa.array(sizes - n_kept, type=pa.int64()),
                }
            )

        return docs.map_batches(clean, batch_format="pyarrow")

    # ---- join path: exploded lines anti-join the hot table ----------
    from metacache_mpi_ray.stages.joins import large_join
    from metacache_mpi_ray.stages.windows import _segments, _split_frag

    def explode(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        flat, sizes = _split_lines(t[text_col])
        h = _line_hashes(flat, seed)
        row = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
        seg0 = np.repeat(np.cumsum(sizes) - sizes, sizes)
        ord_ = np.arange(len(h), dtype=np.int64) - seg0
        return pa.table(
            {
                "doc_id": pa.array(ids[row], type=pa.int64()),
                "ord": pa.array(ord_, type=pa.int64()),
                "line": flat,
                "line_hash": pa.array(h, type=pa.int64()),
            }
        )

    lines = docs.map_batches(explode, batch_format="pyarrow")
    hot_flagged = hot_mat.map_batches(
        lambda t: pa.table(
            {
                "line_hash": t["line_hash"].cast(pa.int64()),
                "hot_flag": pa.array(
                    np.ones(len(t), dtype=np.int64), type=pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    joined = large_join(
        lines,
        hot_flagged,
        on=("line_hash",),
        join_type="left_outer",
        num_partitions=num_partitions,
    )
    kept = joined.map_batches(
        lambda t: t.filter(pc.is_null(t["hot_flag"])).select(
            ["doc_id", "ord", "line"]
        ),
        batch_format="pyarrow",
    )
    kept_schema = pa.schema(
        [
            pa.field("doc_id", pa.int64()),
            pa.field("ord", pa.int64()),
            pa.field("line", pa.string()),
        ]
    )
    kept = drop_empty_blocks(kept.materialize(), kept_schema)

    sorted_ds = kept.sort(["doc_id", "ord"]).materialize()
    out_cols = ["doc_id", "clean_text", "n_kept", "ord0"]

    def kernel(t: pa.Table) -> pa.Table:
        n = len(t)
        if n == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "clean_text": pa.array([], type=pa.string()),
                    "n_kept": pa.array([], type=pa.int64()),
                    "ord0": pa.array([], type=pa.int64()),
                    "__frag": pa.array([], type=pa.bool_()),
                }
            )
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        ords = t["ord"].to_numpy(zero_copy_only=False)
        flat = t["line"]
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        if pa.types.is_large_string(flat.type):
            flat = flat.cast(pa.string())
        starts, sizes = _segments(ids)
        nseg = len(starts)
        offsets = np.concatenate([starts, starts[-1:] + sizes[-1:]])
        texts = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), flat),
            "\n",
        )
        frag = np.zeros(nseg, dtype=bool)
        frag[0] = True
        frag[-1] = True
        return pa.table(
            {
                "doc_id": pa.array(ids[starts], type=pa.int64()),
                "clean_text": texts,
                "n_kept": pa.array(sizes.astype(np.int64), type=pa.int64()),
                "ord0": pa.array(ords[starts], type=pa.int64()),
                "__frag": pa.array(frag, type=pa.bool_()),
            }
        )

    final, frags = _split_frag(
        sorted_ds.map_batches(kernel, batch_format="pyarrow", batch_size=None),
        out_cols,
    )
    if len(frags):
        f = frags.sort_values(["doc_id", "ord0"], kind="mergesort")
        agg = (
            f.groupby("doc_id", sort=False)
            .agg(
                clean_text=("clean_text", "\n".join),
                n_kept=("n_kept", "sum"),
                ord0=("ord0", "min"),
            )
            .reset_index()
        )
        final = final.union(
            rd.from_arrow(pa.Table.from_pandas(agg[out_cols], preserve_index=False))
        )
    # when every line was hot the sorted dataset has zero typed blocks;
    # normalize to an empty Dataset with the join-facing schema so the
    # outer join below still sees a doc_id column
    reassembled = drop_empty_blocks(
        final.select_columns(["doc_id", "clean_text", "n_kept"]).materialize(),
        pa.schema(
            [
                pa.field("doc_id", pa.int64()),
                pa.field("clean_text", pa.string()),
                pa.field("n_kept", pa.int64()),
            ]
        ),
    )

    # docs whose every line was hot have NO kept row: left-join the full
    # id + line-count table and fill ''/0
    def id_counts(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        _, sizes = _split_lines(t[text_col])
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_lines": pa.array(sizes, type=pa.int64()),
            }
        )

    base = docs.map_batches(id_counts, batch_format="pyarrow")
    if reassembled.limit(1).count() == 0:
        # every line in the corpus was hot: an all-empty join side
        # crashes the Ray 2.49 hash join (see verify._nonempty_or_none),
        # and the answer needs no join at all
        def all_removed(t: pa.Table) -> pa.Table:
            n = len(t)
            return pa.table(
                {
                    "doc_id": t["doc_id"].cast(pa.int64()),
                    "clean_text": pa.array([""] * n, type=pa.string()),
                    "n_kept": pa.array(np.zeros(n, dtype=np.int64), type=pa.int64()),
                    "n_removed": t["n_lines"].cast(pa.int64()),
                }
            )

        return base.map_batches(all_removed, batch_format="pyarrow")
    out = large_join(
        base,
        reassembled,
        on=("doc_id",),
        join_type="left_outer",
        num_partitions=num_partitions,
    )

    def fill(t: pa.Table) -> pa.Table:
        n_lines = t["n_lines"].to_numpy(zero_copy_only=False).astype(np.int64)
        n_kept = pc.fill_null(t["n_kept"], 0).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "clean_text": pc.fill_null(t["clean_text"], ""),
                "n_kept": pa.array(n_kept, type=pa.int64()),
                "n_removed": pa.array(n_lines - n_kept, type=pa.int64()),
            }
        )

    out_schema = pa.schema(
        [
            pa.field("doc_id", pa.int64()),
            pa.field("n_lines", pa.int64()),
            pa.field("clean_text", pa.string()),
            pa.field("n_kept", pa.int64()),
        ]
    )
    return drop_empty_blocks(out.materialize(), out_schema).map_batches(
        fill, batch_format="pyarrow"
    )


def redact_pii_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Replace emails then phone numbers with <EMAIL>/<PHONE> tags;
    counts are over the RAW text (pre-replacement), matching the
    oracle's ``regexp_extract_all`` counts. All-RE2, fully vectorized.
    Returns the input columns with ``text_col`` replaced in place plus
    ``n_emails`` / ``n_phones`` appended."""
    txt = batch[text_col]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    n_em = pc.count_substring_regex(txt, EMAIL_PATTERN).cast(pa.int64())
    n_ph = pc.count_substring_regex(txt, PHONE_PATTERN).cast(pa.int64())
    red = pc.replace_substring_regex(
        pc.replace_substring_regex(txt, EMAIL_PATTERN, "<EMAIL>"),
        PHONE_PATTERN,
        "<PHONE>",
    )
    out = batch.set_column(
        batch.column_names.index(text_col), text_col, red
    )
    return out.append_column("n_emails", n_em).append_column("n_phones", n_ph)


def repetition_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Within-document duplicate-line signals (Gopher repetition rules):
    ``n_dup_lines`` = line occurrences identical to an earlier line of
    the same document; ``n_dup_chars`` = their total UTF-8 character
    count. Purely per-row — no shuffle."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    flat, sizes = _split_lines(batch[text_col])
    h = _line_hashes(flat)
    n = len(sizes)
    row = np.repeat(np.arange(n, dtype=np.int64), sizes)
    dup = np.zeros(len(h), dtype=bool)
    if len(h):
        order = np.lexsort((h, row))
        same = (h[order][1:] == h[order][:-1]) & (row[order][1:] == row[order][:-1])
        dup[order[1:]] = same
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    n_dup = np.bincount(row[dup], minlength=n).astype(np.int64)
    dup_chars = np.bincount(
        row[dup], weights=lens[dup].astype(np.float64), minlength=n
    ).astype(np.int64)
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "n_lines": pa.array(sizes, type=pa.int64()),
            "n_dup_lines": pa.array(n_dup, type=pa.int64()),
            "n_dup_chars": pa.array(dup_chars, type=pa.int64()),
        }
    )


def clean_corpus(docs, **boilerplate_kwargs):
    """Composition: boilerplate-line removal then PII redaction —
    the minimal RefinedWeb-ish cleaning chain as one streamed pipeline."""
    cleaned = remove_boilerplate_lines(docs, **boilerplate_kwargs)
    return cleaned.map_batches(
        lambda t: redact_pii_batch(t, text_col="clean_text"),
        batch_format="pyarrow",
    )

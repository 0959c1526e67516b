"""Corpus-wide vocabulary census: exact term frequency + document
frequency over a document table.

The reference's feature-frequency census (`/root/reference/src/
sketch_database.h:1060-1075` + the ~230-line MPI tree-merge at
`mode_build.cpp:847-1022`) counts how many locations each index feature
accumulated; the training-data analog at token granularity is the
vocabulary census every corpus pipeline needs (heavy-hitter terms,
document frequency for IDF, stopword discovery). Same Ray Data shape as
the boilerplate line census (`stages/corpus_clean.py:line_census`):

* partial aggregation inside ``map_batches`` — each batch emits one row
  per distinct term with its within-batch occurrence count (tf) and
  distinct-document count (df); the exploded token table never reaches
  the shuffle,
* ONE ``sort("term")`` range shuffle,
* per-block segment sums (``np.add.reduceat`` over Arrow-computed
  change points) with the windows-family boundary-fragment stitch, so
  a term straddling two sorted blocks is summed exactly once.

df summed over batches is exact because a document is exactly one row
of exactly one batch (the same invariant the line census relies on).

Tokenization is deliberately SQL-reproducible so the census is
oracle-checkable bit-for-bit in DuckDB (both engines are RE2):
lowercase, collapse ``[^a-z0-9]+`` runs to a single space, trim, split
on the single space. ``TOKEN_SQL_EXPR`` is the DuckDB expression that
produces the identical token list.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

TOKEN_PATTERN = "[^a-z0-9]+"

# DuckDB expression producing the same token list as tokenize_column
# (both regex engines are RE2; corpus text is ASCII-safe either way
# because non-alnum chars are collapsed after Unicode-aware lowering).
TOKEN_SQL_EXPR = (
    "string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')"
)

_CENSUS_SCHEMA = pa.schema(
    [
        pa.field("term", pa.string()),
        pa.field("tf", pa.int64()),
        pa.field("df", pa.int64()),
    ]
)


def tokenize_column(col):
    """string column -> (flat token Array, tokens-per-row int64 ndarray).

    Kernel chain is pure Arrow C++ (lower -> RE2 collapse -> trim ->
    split); empty rows produce zero tokens.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    norm = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(pc.utf8_lower(col), TOKEN_PATTERN, " ")
    )
    lst = pc.split_pattern(norm, " ")
    flat = pc.list_flatten(lst)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    sizes = pc.list_value_length(lst).to_numpy(zero_copy_only=False).astype(np.int64)
    # an all-empty row normalizes to "" whose split is [""] — drop the
    # empty token and fix that row's size so row-repeat stays aligned
    if len(flat):
        empty = pc.equal(flat, "").to_numpy(zero_copy_only=False)
        if empty.any():
            row = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
            np.subtract.at(sizes, row[empty], 1)
            flat = flat.filter(pa.array(~empty))
    return flat, sizes


def _census_partial(text_col: str):
    def partial(t: pa.Table) -> pa.Table:
        flat, sizes = tokenize_column(t[text_col])
        if len(flat) == 0:
            return _CENSUS_SCHEMA.empty_table()
        row = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
        g = (
            pa.table({"term": flat, "row": pa.array(row, type=pa.int64())})
            .group_by("term")
            .aggregate([("row", "count"), ("row", "count_distinct")])
        )
        return pa.table(
            {
                "term": g["term"],
                "tf": g["row_count"].cast(pa.int64()),
                "df": g["row_count_distinct"].cast(pa.int64()),
            }
        )

    return partial


def vocab_census(docs, *, text_col: str = "text"):
    """Exact (term, tf, df) census over the corpus.

    tf = total occurrences, df = distinct documents containing the
    term. One range shuffle; everything else is per-block.
    """
    from metacache_mpi_ray.stages.windows import _split_frag

    sorted_ds = (
        docs.map_batches(_census_partial(text_col), batch_format="pyarrow")
        .sort("term")
        .materialize()
    )
    if sorted_ds.count() == 0:
        return rd.from_arrow(_CENSUS_SCHEMA.empty_table())

    def ksum(t: pa.Table) -> pa.Table:
        terms = t["term"]
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        n = len(terms)
        if n == 0:
            return _CENSUS_SCHEMA.empty_table().append_column(
                "__frag", pa.array([], type=pa.bool_())
            )
        change = np.empty(n, dtype=bool)
        change[0] = True
        if n > 1:
            change[1:] = pc.not_equal(
                terms.slice(1), terms.slice(0, n - 1)
            ).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(change)
        tf = np.add.reduceat(t["tf"].to_numpy(zero_copy_only=False), starts)
        df = np.add.reduceat(t["df"].to_numpy(zero_copy_only=False), starts)
        # first and last segment of the block may continue in the
        # neighboring sorted block — route them to the driver stitch
        frag = np.zeros(len(starts), dtype=bool)
        frag[0] = True
        frag[-1] = True
        return pa.table(
            {
                "term": terms.take(pa.array(starts, type=pa.int64())),
                "tf": pa.array(tf.astype(np.int64), type=pa.int64()),
                "df": pa.array(df.astype(np.int64), type=pa.int64()),
                "__frag": pa.array(frag, type=pa.bool_()),
            }
        )

    final, frags = _split_frag(
        sorted_ds.map_batches(ksum, batch_format="pyarrow", batch_size=None),
        ["term", "tf", "df"],
    )
    if len(frags):
        agg = frags.groupby("term", sort=False)[["tf", "df"]].sum().reset_index()
        final = final.union(
            rd.from_arrow(
                pa.Table.from_pandas(
                    agg[["term", "tf", "df"]], preserve_index=False
                ).cast(_CENSUS_SCHEMA)
            )
        )
    return final


def top_terms(docs, k: int = 50, *, text_col: str = "text"):
    """Corpus heavy hitters: top-k terms by total occurrence count,
    ties broken by term (ascending) for determinism."""
    census = vocab_census(docs, text_col=text_col)

    def neg(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__ntf", pc.negate_checked(t["tf"].cast(pa.int64()))
        )

    return (
        census.map_batches(neg, batch_format="pyarrow")
        .sort(["__ntf", "term"])
        .limit(k)
        .select_columns(["term", "tf"])
    )

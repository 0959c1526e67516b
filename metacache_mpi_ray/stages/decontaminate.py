"""Benchmark decontamination: token-n-gram overlap against an eval set.

A training corpus must not contain verbatim passages from the
benchmarks it will be evaluated on, so large-scale pipelines remove
every document sharing an n-token gram with the held-out set (the
GPT-3/PaLM-style 13-gram rule; we default to n=5 so small test corpora
actually overlap). Structurally this is the reference's clade-exclusion
anti-filter (/root/reference/src/classification.cpp:141-183: drop hits
whose key appears in an excluded set) with a token n-gram as the key,
and it reuses the repo's broadcast-vs-join auto switch:

* the benchmark's distinct gram hashes are tiny by construction
  (benchmarks are ~1e5 docs even when the corpus is 1e12), so the
  default path assembles them OFF-driver into one sorted u64 array,
  broadcast once via the object store, and every corpus batch does a
  vectorized ``searchsorted`` membership test — no shuffle at all;
* when the gram table outgrows the object store the same semantics run
  as a hash-partitioned inner join of exploded ``(doc_id, gram)`` rows
  against the distinct benchmark grams, aggregated back per document.

Hashing: each token gets a content hash (zero-copy from the Arrow
buffer), and an n-gram's hash is a position-normalized polynomial over
the n token hashes — the same prefix-sum machinery as the byte-level
shingler (functions/hashing.py), lifted from uint8 symbols to u64
symbols. Gram-hash equality therefore tracks string equality of the
space-joined token window (63+ bit hashes; collisions negligible),
which is what the DuckDB oracle checks string-wise.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data.aggregate import Count

from metacache_mpi_ray.functions.hashing import (
    U64,
    _pow_seq,
    _shingle_base,
    arrow_string_buffer,
    doc_hashes_from_buffer,
    murmur3_fmix64,
)
from metacache_mpi_ray.stages.corpus_clean import _is_in_sorted

DECON_SEED = 67


def token_ngram_hashes(
    tok_flat, sizes: np.ndarray, n: int, seed: int = DECON_SEED
) -> tuple[np.ndarray, np.ndarray]:
    """Hash every n-token gram fully inside a row.

    ``tok_flat`` is an Arrow string array of all tokens in row-major
    order; ``sizes`` is tokens-per-row. Returns ``(gram_hash_u64,
    row_index)`` with one entry per gram POSITION (rows shorter than n
    tokens contribute nothing). One prefix-sum pass over the per-token
    content hashes; grams never span a row boundary by construction of
    the per-row gather.
    """
    nrows = len(sizes)
    empty = (np.empty(0, dtype=U64), np.empty(0, dtype=np.int64))
    if nrows == 0 or len(tok_flat) == 0:
        return empty
    data, starts, ends = arrow_string_buffer(tok_flat)
    th = doc_hashes_from_buffer(data, starts, ends, seed)
    ns = np.maximum(sizes.astype(np.int64) - n + 1, 0)
    total = int(ns.sum())
    if total == 0:
        return empty
    b, binv = _shingle_base(seed + 1)
    m = len(th)
    with np.errstate(over="ignore"):
        pows = _pow_seq(b, m)
        terms = (th + U64(1)) * pows
        prefix = np.concatenate([np.zeros(1, dtype=U64), np.cumsum(terms, dtype=U64)])
        row_idx = np.repeat(np.arange(nrows, dtype=np.int64), ns)
        seg0 = np.cumsum(sizes) - sizes  # first token index per row
        gs = np.cumsum(ns) - ns
        within = np.arange(total, dtype=np.int64) - np.repeat(gs, ns)
        src = seg0[row_idx] + within
        inv = _pow_seq(binv, m)
        vals = (prefix[src + n] - prefix[src]) * inv[src]
    return murmur3_fmix64(vals), row_idx


def _batch_grams(t: pa.Table, text_col: str, n: int, seed: int):
    """(gram_hash u64, row_index) for a batch's text column."""
    col = t[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # null text -> "" (zero tokens, zero grams); without this the null
    # list's NaN length wraps to INT64_MIN and the gram count explodes
    col = pc.fill_null(col, "")
    toks = pc.utf8_split_whitespace(col)
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    sizes = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    return token_ngram_hashes(flat, sizes, n, seed)


def benchmark_grams(bench, *, n: int = 5, text_col: str = "text", seed: int = DECON_SEED):
    """Dataset of the benchmark's distinct gram hashes: (g:int64).

    Per-batch unique in numpy first, then ONE groupby shuffle for the
    global distinct — the benchmark side is small, but the shape stays
    correct if it isn't. Hashes are carried as int64 via a bijective
    u64->i64 view (order differs, equality doesn't).
    """

    def partial(t: pa.Table) -> pa.Table:
        h, _ = _batch_grams(t, text_col, n, seed)
        return pa.table({"g": pa.array(np.unique(h).view(np.int64), type=pa.int64())})

    from metacache_mpi_ray.functions.blocks import drop_empty_blocks

    distinct = (
        bench.map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .aggregate(Count())
    )

    def project(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "g" not in t.column_names:
            return pa.table({"g": pa.array([], type=pa.int64())})
        return pa.table({"g": t["g"].cast(pa.int64())})

    out = distinct.map_batches(project, batch_format="pyarrow").materialize()
    return drop_empty_blocks(out, pa.schema([pa.field("g", pa.int64())]))


def decontaminate(
    docs,
    bench,
    *,
    n: int = 5,
    mode: str = "flag",
    text_col: str = "text",
    id_col: str = "doc_id",
    strategy: str = "auto",
    broadcast_limit: int = 256 << 20,
    num_partitions: int | None = None,
    seed: int = DECON_SEED,
):
    """Flag or drop corpus docs sharing any n-token gram with ``bench``.

    ``mode='flag'`` returns (doc_id, n_hits, is_contaminated) where
    ``n_hits`` counts gram POSITIONS of the doc whose gram occurs
    anywhere in the benchmark (is_contaminated = n_hits > 0, as int64
    for oracle-compare stability). ``mode='filter'`` returns the input
    rows of clean documents unchanged.

    ``strategy``: 'broadcast' ships the sorted benchmark gram array
    (assembled off-driver from block refs); 'join' explodes corpus
    grams and inner-joins the distinct benchmark grams, aggregating
    hits per doc; 'auto' picks by benchmark gram count x 8 bytes vs
    ``broadcast_limit``.
    """
    if mode not in ("flag", "filter"):
        raise ValueError(f"mode must be 'flag' or 'filter', got {mode!r}")
    if strategy not in ("auto", "broadcast", "join"):
        raise ValueError(
            f"strategy must be 'auto', 'broadcast' or 'join', got {strategy!r}"
        )
    from metacache_mpi_ray.functions.blocks import (
        assemble_sorted_i64,
        drop_empty_blocks,
    )

    def zero_flags(t: pa.Table) -> pa.Table:
        z = np.zeros(len(t), dtype=np.int64)
        return pa.table(
            {
                "doc_id": t[id_col].cast(pa.int64()),
                "n_hits": pa.array(z, type=pa.int64()),
                "is_contaminated": pa.array(z, type=pa.int64()),
            }
        )

    bg = benchmark_grams(bench, n=n, text_col=text_col, seed=seed)
    n_grams = bg.count()

    if n_grams == 0:
        # empty benchmark: nothing is contaminated (and an empty join
        # side would crash the Ray 2.49 hash join)
        if mode == "filter":
            return docs
        return docs.map_batches(zero_flags, batch_format="pyarrow")

    if strategy == "broadcast" or (
        strategy == "auto" and n_grams * 8 <= broadcast_limit
    ):
        gram_ref = assemble_sorted_i64(bg.materialize(), "g")

        def score(t: pa.Table) -> pa.Table:
            h, row = _batch_grams(t, text_col, n, seed)
            grams = ray.get(gram_ref)  # zero-copy shared-memory read
            hit = _is_in_sorted(grams, h.view(np.int64))
            n_hits = np.bincount(row[hit], minlength=len(t)).astype(np.int64)
            if mode == "filter":
                return t.filter(pa.array(n_hits == 0))
            return pa.table(
                {
                    "doc_id": t[id_col].cast(pa.int64()),
                    "n_hits": pa.array(n_hits, type=pa.int64()),
                    "is_contaminated": pa.array(
                        (n_hits > 0).astype(np.int64), type=pa.int64()
                    ),
                }
            )

        return docs.map_batches(score, batch_format="pyarrow")

    # ---- join path: exploded corpus grams x distinct benchmark grams
    from metacache_mpi_ray.stages.joins import large_join

    def explode(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h, row = _batch_grams(t, text_col, n, seed)
        return pa.table(
            {
                "doc_id": pa.array(ids[row], type=pa.int64()),
                "g": pa.array(h.view(np.int64), type=pa.int64()),
            }
        )

    corpus_grams = docs.map_batches(explode, batch_format="pyarrow")
    hits = large_join(
        corpus_grams,
        bg,
        on=("g",),
        join_type="inner",
        num_partitions=num_partitions,
    )
    agg = hits.groupby("doc_id").aggregate(Count())

    def hit_counts(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "doc_id" not in t.column_names:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_hits": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "n_hits": t["count()"].cast(pa.int64()),
            }
        )

    hit_schema = pa.schema(
        [pa.field("doc_id", pa.int64()), pa.field("n_hits", pa.int64())]
    )
    flagged = drop_empty_blocks(
        agg.map_batches(hit_counts, batch_format="pyarrow").materialize(),
        hit_schema,
    )
    if flagged.limit(1).count() == 0:
        # grams existed but none matched: every doc is clean
        if mode == "filter":
            return docs
        return docs.map_batches(zero_flags, batch_format="pyarrow")

    if mode == "filter":
        # flagged's key column is named 'doc_id' but holds id_col
        # values; rename so the join keys on the caller's id column
        flagged_keyed = (
            flagged
            if id_col == "doc_id"
            else flagged.map_batches(
                lambda t: t.rename_columns([id_col, "n_hits"]),
                batch_format="pyarrow",
            )
        )
        joined = large_join(
            docs,
            flagged_keyed,
            on=(id_col,),
            join_type="left_outer",
            num_partitions=num_partitions,
        )
        return joined.map_batches(
            lambda t: t.filter(pc.is_null(t["n_hits"])).drop_columns(["n_hits"]),
            batch_format="pyarrow",
        )

    def ids_only(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t[id_col].cast(pa.int64())})

    base = docs.map_batches(ids_only, batch_format="pyarrow")
    joined = large_join(
        base,
        flagged,
        on=("doc_id",),
        join_type="left_outer",
        num_partitions=num_partitions,
    )

    def fill(t: pa.Table) -> pa.Table:
        nh = pc.fill_null(t["n_hits"], 0).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "n_hits": pa.array(nh, type=pa.int64()),
                "is_contaminated": pa.array(
                    (nh > 0).astype(np.int64), type=pa.int64()
                ),
            }
        )

    out_schema = pa.schema(
        [pa.field("doc_id", pa.int64()), pa.field("n_hits", pa.int64())]
    )
    return drop_empty_blocks(joined.materialize(), out_schema).map_batches(
        fill, batch_format="pyarrow"
    )

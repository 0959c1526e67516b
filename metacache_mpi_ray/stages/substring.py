"""Exact long-match substring dedup — the analog of the reference's
semi-global alignment verification stage (/root/reference/src/
alignment.h:52-299, used at classification.cpp:77-103): after sketch-
based candidates, an exact character-level check confirms real overlap.

Two layers:

1. ``anchor_candidates`` — corpus-wide: every doc emits sampled exact
   ``anchor_len``-char anchors (keep a window's rolling hash when
   ``hash % anchor_mod == 0`` — winnowing-style deterministic sampling);
   a groupby on the anchor hash yields docs sharing an exact span,
   star-edges like the LSH stage. Because the anchor is an exact
   64-char substring, a shared key IS an exact long match (up to 64-bit
   hash collision, same risk class as the reference's feature hash).

2. ``cluster_lcs_report`` — per-cluster exact refinement: the longest
   common substring of each member against the cluster representative
   via the ``lcs_len_hashed`` binary-search rolling-hash kernel,
   dispatched as one sort + per-batch segment kernel (round-3; the
   suffix-array machinery below remains as the cross-check oracle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from metacache_mpi_ray.config import DedupConfig
from metacache_mpi_ray.functions.hashing import U64, splitmix64
from metacache_mpi_ray.stages.candidates import (
    split_edges_and_bridges,
    bucket_edges,
    dedupe_edges,
)


def host_of_url_arrow(col):
    """Vectorized url -> host (authority); rows without a scheme fall
    back to the whole string (the documents-table adapter uses doc_id
    strings as urls)."""
    import pyarrow.compute as pc

    ex = pc.extract_regex(
        col,
        # authority minus userinfo and port: DNS hosts are
        # case-insensitive and userinfo/port must not split a host into
        # several "distinct sources" for the D4 count
        pattern=r"^[a-zA-Z][a-zA-Z0-9+.\-]*://(?:[^/?#@]*@)?(?P<h>[^/?#:]+)",
    )
    host = pc.struct_field(ex, "h")
    return pc.utf8_lower(pc.if_else(pc.is_valid(host), host, col))


def anchor_rows(
    cfg: DedupConfig, *, include_host: bool = False, include_pos: bool = False
):
    """map_batches fn: docs -> (anchor_hash:int64, doc_id:int64
    [, host][, pos]) rows.

    Fully vectorized over the batch: one shingle pass (width anchor_len)
    straight from the Arrow string buffer, winnowing-style selection
    (hash % anchor_mod == 0), then per-doc dedup via lexsort.
    ``include_host`` adds the doc's url host per row for the D4
    ambiguity filter (boilerplate spans shared across many hosts);
    ``include_pos`` adds each anchor's window position (one row per
    (doc, hash) keeping its SMALLEST position) for the contiguous-run
    scorer — one emitter for both shapes, so the kernels cannot
    drift apart (round-3 review)."""
    from metacache_mpi_ray.functions.hashing import (
        arrow_string_buffer,
        shingle_hashes_from_buffer,
    )

    L, mod = cfg.anchor_len, cfg.anchor_mod

    def emit(batch: pa.Table) -> pa.Table:
        data, starts, ends = arrow_string_buffer(batch["norm_text"])
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        lens = ends - starts
        long_enough = lens >= L
        cols = {"anchor_hash": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64())}
        if include_host:
            cols["host"] = pa.array([], type=pa.string())
        if include_pos:
            cols["pos"] = pa.array([], type=pa.int64())
        empty = pa.table(cols)
        if not long_enough.any():
            return empty
        h, offsets = shingle_hashes_from_buffer(
            data, starts[long_enough], ends[long_enough], L, cfg.seed + 1
        )
        counts = np.diff(offsets)
        row_idx = np.flatnonzero(long_enough)
        src_row = np.repeat(row_idx, counts)
        doc_of = ids[src_row]
        pos_all = (
            np.arange(len(h), dtype=np.int64) - np.repeat(offsets[:-1], counts)
            if include_pos
            else None
        )
        sel = h % U64(mod) == 0
        if not sel.any():
            return empty
        hs, ds, rows_sel = h[sel], doc_of[sel], src_row[sel]
        ps = pos_all[sel] if include_pos else None
        # dedup (doc, hash) pairs: lexsort + adjacent-compare; with
        # positions, the smallest position per pair sorts (and stays)
        # first
        order = (
            np.lexsort((ps, hs, ds)) if include_pos else np.lexsort((hs, ds))
        )
        hs, ds, rows_sel = hs[order], ds[order], rows_sel[order]
        if include_pos:
            ps = ps[order]
        keep = np.empty(len(hs), dtype=bool)
        keep[0] = True
        keep[1:] = (hs[1:] != hs[:-1]) | (ds[1:] != ds[:-1])
        hh = (hs[keep] >> np.uint64(1)).astype(np.int64)
        hh[hh == 0] = 1  # 0 is the bridge-row sentinel (2^-63 event)
        out = {
            "anchor_hash": pa.array(hh),
            "doc_id": pa.array(ds[keep], type=pa.int64()),
        }
        if include_host:
            hosts = host_of_url_arrow(batch["url"])
            if isinstance(hosts, pa.ChunkedArray):
                hosts = hosts.combine_chunks()
            out["host"] = hosts.take(pa.array(rows_sel[keep]))
        if include_pos:
            out["pos"] = pa.array(ps[keep], type=pa.int64())
        return pa.table(out)

    return emit


def anchor_candidates(
    docs,
    cfg: DedupConfig | None = None,
    *,
    num_partitions: int = 16,
    max_hosts: int | None = None,
):
    """docs -> (a, b, n_bands_hit) edges of docs sharing >=1 exact anchor.

    ``n_bands_hit`` here counts shared sampled anchors — a proxy for
    shared-span length (each anchor covers anchor_len chars, sampled at
    ~1/anchor_mod density). ``max_hosts`` engages the D4 ambiguity
    filter: anchors appearing on more than that many distinct url hosts
    are boilerplate (navigation, footers) and are removed BEFORE the
    bucket shuffle, mirroring sketch_database.h:428-470."""
    cfg = cfg or DedupConfig()
    rows = docs.map_batches(
        anchor_rows(cfg, include_host=max_hosts is not None),
        batch_format="pyarrow",
    )
    if max_hosts is not None:
        from metacache_mpi_ray.stages.candidates import ambiguity_filter

        rows = ambiguity_filter(rows, "anchor_hash", "host", max_hosts)
        rows = rows.select_columns(["anchor_hash", "doc_id"])
    edges = bucket_edges(
        rows, key_cols=["anchor_hash"], id_col="doc_id",
        cap=cfg.bucket_cap, num_partitions=num_partitions,
    )
    return dedupe_edges(edges, num_partitions=num_partitions)


def substring_dup_edges(docs, cfg: DedupConfig | None = None, **kw):
    """Edges whose shared exact span is plausibly >= min_match_len.

    Anchors survive winnowing at density ~1/anchor_mod, so a truly
    shared span of min_match_len chars yields on expectation
    E = (min_match_len - anchor_len) / anchor_mod shared anchors; the
    filter requires >= max(1, E // 4) — recall-safe against a 4x
    shortfall of the sampling (P[X < E/4] is negligible for E >= 8)
    while still rejecting pairs sharing only a few boilerplate anchors
    when E is large. (Round-3 review: the old divisor used anchor_len,
    which over-required anchors for sparse anchor_mod configs.)"""
    cfg = cfg or DedupConfig()
    need = max(1, (cfg.min_match_len - cfg.anchor_len) // (cfg.anchor_mod * 4))
    edges = anchor_candidates(docs, cfg, **kw)
    return edges.filter(expr=f"n_bands_hit >= {need}")


# ---------------------------------------------------------------------------
# A1 full analog: contiguous positional-anchor runs -> shared-span estimate
# ---------------------------------------------------------------------------

def positional_anchor_rows(cfg: DedupConfig):
    """docs -> (anchor_hash, doc_id, pos) rows: ``anchor_rows`` with the
    window position the contiguous-run scorer needs
    (/root/reference/src/candidates.h:118-180 scores hits inside a
    bounded window RANGE, not hit counts). One (doc_id, anchor_hash)
    keeps its smallest position."""
    return anchor_rows(cfg, include_pos=True)


def _pairs_from_group(g_ids: np.ndarray, g_pos: np.ndarray, pair_cap: int):
    """All distinct (a<b) pairs of one anchor bucket with diagonal and
    a-side position — one segment through the shared vectorized kernel
    (``segment_all_pairs``), so the cross-fragment stitch uses exactly
    the in-batch cap-sampling rule and a split bucket reassembles to
    the same pair set a one-batch bucket would emit."""
    from metacache_mpi_ray.stages.candidates import segment_all_pairs

    a, b, ea, eb = segment_all_pairs(
        g_ids,
        np.zeros(1, dtype=np.int64),
        np.array([len(g_ids)], dtype=np.int64),
        np.ones(1, dtype=bool),
        extra=g_pos,
        sample_cap=pair_cap,
    )
    return a, b, ea - eb, ea


def _emit_bucket_pairs(pair_cap: int):
    """Sorted (anchor_hash, doc_id, pos) batch -> (a, b, diag, pos_a)
    pair rows per bucket (all pairs, bucket capped at ``pair_cap``
    deterministically-sampled members). Buckets split across batch
    boundaries ship their first/last-segment members as bridge rows
    (bridge_key = anchor_hash, pos riding in pos_a) for the driver
    stitch in ``scored_substring_edges`` — exact reassembly, replacing
    round-2's per-fragment (recall-lenient) scoring."""

    def emit(t: pa.Table) -> pa.Table:
        keys = t["anchor_hash"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        pos = t["pos"].to_numpy(zero_copy_only=False)
        n = len(keys)
        empty = pa.table(
            {"a": pa.array([], type=pa.int64()),
             "b": pa.array([], type=pa.int64()),
             "diag": pa.array([], type=pa.int64()),
             "pos_a": pa.array([], type=pa.int64()),
             "bridge_key": pa.array([], type=pa.int64())}
        )
        if n == 0:
            return empty
        change = np.empty(n, dtype=bool)
        change[0] = True
        np.not_equal(keys[1:], keys[:-1], out=change[1:])
        starts = np.flatnonzero(change)
        sizes = np.diff(np.append(starts, n))
        nseg = len(starts)
        from metacache_mpi_ray.stages.candidates import segment_all_pairs

        # boundary segments LARGER than the cap are excluded from
        # in-batch emission: their per-fragment sample differs from the
        # reassembled bucket's global sample, so emitting both would
        # make the pair set depend on batch layout (round-3 review).
        # The stitch re-emits them from the global min-mix sample; an
        # over-cap bucket fully interior to a batch samples over its
        # complete membership, which IS the global sample.
        mask = sizes > 1
        boundary = np.zeros(nseg, dtype=bool)
        boundary[0] = boundary[-1] = True
        mask &= ~(boundary & (sizes > pair_cap))
        a, b, ea, eb = segment_all_pairs(
            ids, starts, sizes, mask, extra=pos, sample_cap=pair_cap
        )
        d = ea - eb
        p = ea
        # bridge rows: members of the batch's first and last segment.
        # HOT-BUCKET BOUND: a fragment larger than pair_cap ships only
        # its pair_cap smallest-splitmix64(id) rows — the stitch's
        # _pairs_from_group applies that SAME deterministic sampling to
        # the reassembled bucket, and the global sample is always a
        # subset of the union of per-fragment samples, so the stitched
        # pair set is unchanged while a boilerplate anchor shared by
        # 100k docs no longer floods the driver (r3 review finding).
        bridge_idx = [0] if nseg == 1 else [0, nseg - 1]
        bm_l, bp_l, bk_l = [], [], []
        for gi in bridge_idx:
            sl = slice(starts[gi], starts[gi] + sizes[gi])
            f_ids, f_pos = ids[sl], pos[sl]
            if sizes[gi] > pair_cap:
                mix = splitmix64(f_ids.astype(np.int64).view(U64))
                pick = np.argsort(mix, kind="stable")[:pair_cap]
                f_ids, f_pos = f_ids[pick], f_pos[pick]
            bm_l.append(f_ids)
            bp_l.append(f_pos)
            bk_l.append(np.full(len(f_ids), keys[starts[gi]], dtype=np.int64))
        bm = np.concatenate(bm_l)
        bp = np.concatenate(bp_l)
        bk = np.concatenate(bk_l)
        zero = np.zeros(len(a), dtype=np.int64)
        zb = np.zeros(len(bm), dtype=np.int64)
        return pa.table(
            {
                "a": pa.array(np.concatenate([a, bm]), type=pa.int64()),
                "b": pa.array(np.concatenate([b, zb]), type=pa.int64()),
                "diag": pa.array(np.concatenate([d, zb]), type=pa.int64()),
                "pos_a": pa.array(np.concatenate([p, bp]), type=pa.int64()),
                "bridge_key": pa.array(np.concatenate([zero, bk]), type=pa.int64()),
            }
        )

    return emit


def scored_substring_edges(
    docs,
    cfg: DedupConfig | None = None,
    *,
    num_partitions: int = 16,
    pair_cap: int = 16,
    max_gap: int | None = None,
    pair_batch_size: int | None = None,
):
    """Candidate pairs scored by the longest CONTIGUOUS anchor run on a
    shared diagonal (pos_a - pos_b constant): est_span ≈ the longest
    exactly-shared region — the precision upgrade over the count-based
    ``substring_dup_edges`` heuristic. Returns (a, b, est_span) with
    est_span >= cfg.min_match_len.

    Two sort-shuffles, both vectorized per batch: anchors bucket by
    hash (pairs per bucket), then pairs order by (a, b, diag, pos_a)
    for run detection via gap thresholds + reduceat.
    """
    from ray.data.aggregate import Max

    cfg = cfg or DedupConfig()
    if max_gap is None:
        # anchors sample ~1/anchor_mod of positions; a gap beyond
        # anchor_len + 8*mod positions inside a truly shared region has
        # probability (1-1/mod)^gap ~ e^-8 — treat as a region break
        max_gap = cfg.anchor_len + 8 * cfg.anchor_mod
    rows = docs.map_batches(positional_anchor_rows(cfg), batch_format="pyarrow")
    # coalesce before the sort: Ray's sort pays one sample task + one
    # reduce partition per INPUT block (see pipelines/dedup.py — 5x
    # measured on the flagship's band sort); this is also what
    # num_partitions controls here
    emitted = (
        rows.repartition(num_partitions)
        .sort("anchor_hash")
        .map_batches(
            _emit_bucket_pairs(pair_cap),
            batch_format="pyarrow",
            batch_size=pair_batch_size,
        )
        .materialize()
    )

    # stitch buckets split across batch boundaries: reassemble members
    # from the bridge rows (<= 2 segments/batch) and emit the full pair
    # set under the shared cap-sampling rule; duplicates of in-fragment
    # pairs collapse in the runs kernel (equal positions -> same span)
    pairs, bridges = split_edges_and_bridges(
        emitted, ["a", "b", "diag", "pos_a"], ["a", "pos_a", "bridge_key"]
    )
    if len(bridges):
        ex_a, ex_b, ex_d, ex_p = [], [], [], []
        for _, grp in bridges.groupby("bridge_key"):
            g_ids = grp["a"].to_numpy(dtype=np.int64)
            g_pos = grp["pos_a"].to_numpy(dtype=np.int64)
            if len(g_ids) < 2:
                continue
            a2, b2, d2, p2 = _pairs_from_group(g_ids, g_pos, pair_cap)
            ex_a.append(a2)
            ex_b.append(b2)
            ex_d.append(d2)
            ex_p.append(p2)
        if ex_a and sum(len(x) for x in ex_a):
            import ray.data as rd

            extra = pa.table(
                {
                    "a": pa.array(np.concatenate(ex_a), type=pa.int64()),
                    "b": pa.array(np.concatenate(ex_b), type=pa.int64()),
                    "diag": pa.array(np.concatenate(ex_d), type=pa.int64()),
                    "pos_a": pa.array(np.concatenate(ex_p), type=pa.int64()),
                }
            )
            pairs = pairs.union(rd.from_arrow(extra))

    def runs(t: pa.Table) -> pa.Table:
        """Interior (a, b, diag) segments score their gap-split runs in
        place; the batch's first and last segment ship raw (pos riding
        in est_span, is_frag=1) to a driver stitch, so a diagonal run
        split across batch boundaries scores over its full position set
        instead of per fragment (round-2's lenient under-estimate)."""
        n = len(t)
        empty = pa.table(
            {"a": pa.array([], type=pa.int64()),
             "b": pa.array([], type=pa.int64()),
             "diag": pa.array([], type=pa.int64()),
             "est_span": pa.array([], type=pa.int64()),
             "is_frag": pa.array([], type=pa.bool_())}
        )
        if n == 0:
            return empty
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        d = t["diag"].to_numpy(zero_copy_only=False)
        p = t["pos_a"].to_numpy(zero_copy_only=False)
        seg = np.empty(n, dtype=bool)
        seg[0] = True
        seg[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1]) | (d[1:] != d[:-1])
        seg_starts = np.flatnonzero(seg)
        seg_sizes = np.diff(np.append(seg_starts, n))
        nseg = len(seg_starts)
        seg_idx = np.repeat(np.arange(nseg), seg_sizes)
        edge_row = (seg_idx == 0) | (seg_idx == nseg - 1)
        # interior rows: gap-split runs, vectorized
        brk = seg.copy()
        brk[1:] |= (p[1:] - p[:-1]) > max_gap
        interior = ~edge_row
        cols = {"a": [], "b": [], "d": [], "v": [], "frag": []}
        if interior.any():
            ii = np.flatnonzero(interior)
            bi = brk[ii].copy()
            bi[0] = True
            starts_i = ii[np.flatnonzero(bi)]
            sizes_i = np.diff(np.append(np.flatnonzero(bi), len(ii)))
            last_i = ii[np.flatnonzero(bi) + sizes_i - 1]
            span = p[last_i] - p[starts_i] + cfg.anchor_len
            cols["a"].append(a[starts_i])
            cols["b"].append(b[starts_i])
            cols["d"].append(d[starts_i])
            cols["v"].append(span)
            cols["frag"].append(np.zeros(len(starts_i), dtype=bool))
        if edge_row.any():
            ei = np.flatnonzero(edge_row)
            cols["a"].append(a[ei])
            cols["b"].append(b[ei])
            cols["d"].append(d[ei])
            cols["v"].append(p[ei])  # raw positions for the stitch
            cols["frag"].append(np.ones(len(ei), dtype=bool))
        return pa.table(
            {
                "a": pa.array(np.concatenate(cols["a"]), type=pa.int64()),
                "b": pa.array(np.concatenate(cols["b"]), type=pa.int64()),
                "diag": pa.array(np.concatenate(cols["d"]), type=pa.int64()),
                "est_span": pa.array(np.concatenate(cols["v"]), type=pa.int64()),
                "is_frag": pa.array(np.concatenate(cols["frag"]), type=pa.bool_()),
            }
        )

    emitted2 = (
        pairs.repartition(num_partitions)
        .sort(["a", "b", "diag", "pos_a"])
        .map_batches(runs, batch_format="pyarrow", batch_size=pair_batch_size)
        .materialize()
    )

    from metacache_mpi_ray.stages.candidates import split_final_and_frags

    scored_rows, frags = split_final_and_frags(
        emitted2,
        "is_frag",
        pa.schema([("a", pa.int64()), ("b", pa.int64()), ("est_span", pa.int64())]),
        pa.schema(
            [("a", pa.int64()), ("b", pa.int64()), ("diag", pa.int64()),
             ("est_span", pa.int64())]
        ),
    )
    if len(frags):
        fa, fb, fv = [], [], []
        for (ga, gb, _gd), grp in frags.groupby(["a", "b", "diag"]):
            ps = np.sort(np.unique(grp["est_span"].to_numpy(dtype=np.int64)))
            gaps = np.flatnonzero(np.diff(ps) > max_gap)
            rs = np.concatenate([[0], gaps + 1])
            re = np.concatenate([gaps, [len(ps) - 1]])
            span = (ps[re] - ps[rs] + cfg.anchor_len).max()
            fa.append(ga)
            fb.append(gb)
            fv.append(int(span))
        if fa:
            extra2 = pa.table(
                {
                    "a": pa.array(fa, type=pa.int64()),
                    "b": pa.array(fb, type=pa.int64()),
                    "est_span": pa.array(fv, type=pa.int64()),
                }
            )
            import ray.data as rd

            scored_rows = scored_rows.union(rd.from_arrow(extra2))

    scored = scored_rows.groupby(["a", "b"]).aggregate(
        Max("est_span", alias_name="est_span")
    )
    return scored.filter(expr=f"est_span >= {cfg.min_match_len}")


# ---------------------------------------------------------------------------
# suffix array (prefix doubling) + per-cluster longest common substring
# ---------------------------------------------------------------------------

def suffix_array(s: np.ndarray) -> np.ndarray:
    """Suffix array of a uint8/int array via prefix doubling, O(n log n)
    numpy (argsort per round)."""
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.asarray(s, dtype=np.int64)
    sa = np.argsort(rank, kind="stable")
    k = 1
    tmp = np.empty(n, dtype=np.int64)
    while True:
        # key = (rank[i], rank[i+k] or -1)
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        sa = order
        # recompute ranks
        tmp[sa[0]] = 0
        prev_key = (rank[sa[:-1]], second[sa[:-1]])
        cur_key = (rank[sa[1:]], second[sa[1:]])
        newgrp = (cur_key[0] != prev_key[0]) | (cur_key[1] != prev_key[1])
        tmp[sa[1:]] = np.cumsum(newgrp)
        rank = tmp.copy()
        if rank[sa[-1]] == n - 1:
            break
        k *= 2
    return sa


def lcp_array(s: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP array (linear, small Python loop — used only inside
    per-cluster map_groups where n = cluster text size, bounded)."""
    n = len(s)
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    lcp = np.zeros(n, dtype=np.int64)
    h = 0
    sl = s.tolist()
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            while i + h < n and j + h < n and sl[i + h] == sl[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def longest_common_substring_len(a: bytes, b: bytes) -> int:
    """Length of the longest exact common substring of a and b (suffix
    array + LCP over the separated concatenation)."""
    if not a or not b:
        return 0
    # separators outside byte range avoided by mapping to int16 with sentinels
    arr = np.concatenate(
        [
            np.frombuffer(a, dtype=np.uint8).astype(np.int64) + 2,
            [1],
            np.frombuffer(b, dtype=np.uint8).astype(np.int64) + 2,
        ]
    )
    sa = suffix_array(arr)
    lcp = lcp_array(arr, sa)
    na = len(a)
    side_a = sa < na  # suffix starts in a (sentinel at na is neither side)
    side_b = sa > na
    best = 0
    for r in range(1, len(sa)):
        if (side_a[r] and side_b[r - 1]) or (side_b[r] and side_a[r - 1]):
            if lcp[r] > best:
                best = int(lcp[r])
    return best


def lcs_len_hashed(a: bytes, b: bytes, seed: int = 0) -> int:
    """Length of the longest exact common substring via binary search on
    the match length with vectorized rolling-hash window sets:
    a common substring of length L exists iff the L-gram hash sets of a
    and b intersect (monotone in L), so O((n+m) log min(n,m)) numpy
    passes replace the per-suffix Python loops of the suffix-array path.
    64-bit fmix hashes; collision probability ~ (n*m)/2^64 per probe —
    the same risk class as the engine's feature hashes.
    """
    from metacache_mpi_ray.functions.hashing import rolling_shingle_hashes

    if not a or not b:
        return 0
    ua = np.frombuffer(a, dtype=np.uint8)
    ub = np.frombuffer(b, dtype=np.uint8)
    lo, hi = 0, min(len(a), len(b))
    while lo < hi:
        mid = (lo + hi + 1) // 2
        ha = rolling_shingle_hashes(ua, mid, seed)
        hb = rolling_shingle_hashes(ub, mid, seed)
        if np.intersect1d(ha, hb).size:
            lo = mid
        else:
            hi = mid - 1
    return lo


def _lcs_rows_for_cluster(
    cluster_id: int,
    doc_ids: np.ndarray,
    texts: list[str],
    min_cluster: int,
    max_members: int,
):
    """(cluster_id, doc_id, lcs_with_rep) rows for one complete cluster
    whose members arrive doc_id-sorted: LCS of the representative (min
    doc_id) against each of the first ``max_members`` members."""
    if len(doc_ids) < min_cluster:
        return [], [], []
    m = min(len(doc_ids), max_members)
    rep_text = texts[0].encode("utf-8")
    out_c, out_d, out_l = [], [], []
    for i in range(1, m):
        out_c.append(int(cluster_id))
        out_d.append(int(doc_ids[i]))
        out_l.append(lcs_len_hashed(rep_text, texts[i].encode("utf-8")))
    return out_c, out_d, out_l


def cluster_lcs_report(
    docs_with_clusters,
    *,
    min_cluster: int = 2,
    max_members: int = 16,
    batch_size: int | None = None,
):
    """Longest common substring between each cluster's representative
    (min doc_id) and its first ``max_members`` members — per-cluster
    exact refinement.

    Dispatch is ONE ``sort(["cluster_id", "doc_id"])`` range shuffle +
    a per-batch segment kernel (the windows.py pattern), replacing
    round-2's ``groupby.map_groups`` + ``iterrows`` — one Python call
    and DataFrame per cluster dominated at many clusters. The two
    boundary segments of each batch ship raw (id, text) fragment rows
    to an O(#blocks) driver stitch. Per-pair LCS cost is the
    ``lcs_len_hashed`` kernel either way."""
    sorted_ds = (
        docs_with_clusters.select_columns(["cluster_id", "doc_id", "norm_text"])
        .sort(["cluster_id", "doc_id"])
        .materialize()
    )

    def kernel(t: pa.Table) -> pa.Table:
        n = len(t)
        empty = pa.table(
            {"cluster_id": pa.array([], type=pa.int64()),
             "doc_id": pa.array([], type=pa.int64()),
             "lcs_with_rep": pa.array([], type=pa.int64()),
             "text": pa.array([], type=pa.string()),
             "is_frag": pa.array([], type=pa.bool_())}
        )
        if n == 0:
            return empty
        cl = t["cluster_id"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        change = np.empty(n, dtype=bool)
        change[0] = True
        np.not_equal(cl[1:], cl[:-1], out=change[1:])
        starts = np.flatnonzero(change)
        sizes = np.diff(np.append(starts, n))
        nseg = len(starts)
        texts = None  # decoded lazily: interior work may be empty
        out_c, out_d, out_l = [], [], []
        for gi in range(1, nseg - 1):
            if sizes[gi] < min_cluster:
                continue
            if texts is None:
                texts = t["norm_text"].to_pylist()
            s, z = starts[gi], sizes[gi]
            c, d_, l_ = _lcs_rows_for_cluster(
                cl[s], ids[s : s + z], texts[s : s + z], min_cluster, max_members
            )
            out_c.extend(c)
            out_d.extend(d_)
            out_l.extend(l_)
        # boundary segments -> fragment rows (only first max_members per
        # fragment need to travel: rep + members are doc_id-minimal, and
        # a cluster has at most 2 boundary fragments + interior rows
        # already ordered, so the stitch sees a superset of its head)
        # ship enough rows that the stitch can both CHECK min_cluster
        # and score max_members — with min_cluster > max_members, a
        # boundary cluster used to be skipped while the identical
        # interior cluster was scored (round-3 review)
        ship_cap = max(max_members, min_cluster)
        frag_sel = []
        for gi in ([0] if nseg == 1 else [0, nseg - 1]):
            s, z = starts[gi], sizes[gi]
            frag_sel.extend(range(s, s + min(z, ship_cap)))
        ftab = t.take(pa.array(frag_sel, type=pa.int64()))
        n_int = len(out_c)
        n_frag = len(frag_sel)
        return pa.table(
            {
                "cluster_id": pa.array(
                    out_c + ftab["cluster_id"].to_pylist(), type=pa.int64()
                ),
                "doc_id": pa.array(
                    out_d + ftab["doc_id"].to_pylist(), type=pa.int64()
                ),
                "lcs_with_rep": pa.array(
                    out_l + [0] * n_frag, type=pa.int64()
                ),
                "text": pa.array(
                    [""] * n_int + ftab["norm_text"].to_pylist(), type=pa.string()
                ),
                "is_frag": pa.array(
                    [False] * n_int + [True] * n_frag, type=pa.bool_()
                ),
            }
        )

    emitted = sorted_ds.map_batches(
        kernel, batch_format="pyarrow", batch_size=batch_size
    ).materialize()

    from metacache_mpi_ray.stages.candidates import split_final_and_frags

    final, frags = split_final_and_frags(
        emitted,
        "is_frag",
        pa.schema(
            [("cluster_id", pa.int64()), ("doc_id", pa.int64()),
             ("lcs_with_rep", pa.int64())]
        ),
        pa.schema(
            [("cluster_id", pa.int64()), ("doc_id", pa.int64()),
             ("text", pa.string())]
        ),
    )
    if len(frags):
        out_c, out_d, out_l = [], [], []
        for cid, grp in frags.groupby("cluster_id"):
            grp = grp.sort_values("doc_id").head(max(max_members, min_cluster))
            c, d_, l_ = _lcs_rows_for_cluster(
                cid,
                grp["doc_id"].to_numpy(dtype=np.int64),
                grp["text"].tolist(),
                min_cluster,
                max_members,
            )
            out_c.extend(c)
            out_d.extend(d_)
            out_l.extend(l_)
        if out_c:
            import ray.data as rd

            final = final.union(
                rd.from_arrow(
                    pa.table(
                        {
                            "cluster_id": pa.array(out_c, type=pa.int64()),
                            "doc_id": pa.array(out_d, type=pa.int64()),
                            "lcs_with_rep": pa.array(out_l, type=pa.int64()),
                        }
                    )
                )
            )
    return final

"""Text-analysis operators over the documents table — the training-data
pipeline extras (language-ID heuristic, quality scoring, token counting,
document fingerprinting). All vectorized Arrow/pandas kernels inside
map_batches; no per-row Python in hot paths.

Analog of the reference's per-record feature extraction utilities
(header/id extractors /root/reference/src/sequence_io.cpp:576-748,
letter-stat histograms dna_encoding.h:492-560), re-targeted at web text.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


STOPWORD_RE = r"\b(the|and|of|a|to|in|is|it|that|for)\b"

# tiny per-language character/stopword profiles for the n-gram heuristic
_LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to ", " is "],
    "de": [" der ", " und ", " die ", " das ", " ist "],
    "es": [" el ", " la ", " los ", " que ", " es "],
    "fr": [" le ", " la ", " les ", " est ", " une "],
}


def token_count_batch(batch: pa.Table) -> pa.Table:
    """doc_id, n_tokens — whitespace tokenization, Arrow kernels only.

    Semantics match DuckDB's
    ``array_length(regexp_split_to_array(trim(text), '\\s+'))``.
    """
    toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(batch["text"]), r"\s+")
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pc.list_value_length(toks).cast(pa.int64()),
        }
    )


# subword-style pretokenizer: letter runs, single digits, single
# non-alphanumeric marks — the RE2-expressible core of a BPE
# pretokenization (GPT-2's exact pattern needs lookaheads RE2 lacks);
# token counts at this granularity track BPE token counts closely on
# ASCII-ish web text
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def bpe_token_count_batch(batch: pa.Table) -> pa.Table:
    """doc_id, n_bpe_tokens — count of BPE-ish pretokenizer matches,
    one vectorized count_substring_regex kernel per batch."""
    n = pc.count_substring_regex(batch["text"], pattern=BPE_ISH_PATTERN)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_bpe_tokens": n.cast(pa.int64()),
        }
    )


def quality_score_batch(batch: pa.Table) -> pa.Table:
    """Per-doc quality signals: length, token count, stopword matches,
    mean token length. All integer/exact so a SQL oracle can reproduce
    them bit-for-bit."""
    text = batch["text"]
    trimmed = pc.utf8_trim_whitespace(text)
    toks = pc.split_pattern_regex(trimmed, r"\s+")
    n_tokens = pc.list_value_length(toks).cast(pa.int64())
    n_chars = pc.utf8_length(text).cast(pa.int64())
    n_stop = pc.count_substring_regex(text, STOPWORD_RE).cast(pa.int64())
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars_text": n_chars,
            "n_tokens": n_tokens,
            "n_stopwords": n_stop,
        }
    )


class LangIdScorer:
    """Actor-pool stage: heuristic language ID via stopword-marker hits.

    Marker tables are built once per actor (__init__), scored per batch
    with vectorized count_substring — the stateful-stage pattern
    (SURVEY.md §2.3)."""

    def __init__(self):
        self.langs = list(_LANG_MARKERS)
        self.markers = _LANG_MARKERS

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = pc.binary_join_element_wise(
            pa.array([" "] * len(batch)), batch["text"], pa.array([" "] * len(batch)), ""
        )
        scores = np.zeros((len(batch), len(self.langs)), dtype=np.int64)
        for j, lang in enumerate(self.langs):
            for m in self.markers[lang]:
                scores[:, j] += pc.count_substring(text, m).to_numpy(zero_copy_only=False)
        best = np.asarray(self.langs)[scores.argmax(axis=1)]
        best = np.where(scores.max(axis=1) > 0, best, "unknown")
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "pred_lang": pa.array(best.tolist(), type=pa.string()),
                "lang_score": pa.array(scores.max(axis=1), type=pa.int64()),
            }
        )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """64-bit content fingerprint of each document (rolling polynomial
    hash of the raw text bytes, zero-copy from the Arrow buffer)."""
    from metacache_mpi_ray.functions.hashing import (
        arrow_string_buffer,
        doc_hashes_from_buffer,
    )

    data, starts, ends = arrow_string_buffer(batch["text"])
    fp = doc_hashes_from_buffer(data, starts, ends, seed=77)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fingerprint": pa.array((fp >> np.uint64(1)).astype(np.int64), type=pa.int64()),
        }
    )


_FP_P = 1_000_000_007  # prime modulus of the SQL-reproducible fingerprint
_FP_B = 131            # polynomial base


def _mod_powers(maxlen: int) -> np.ndarray:
    """B^0..B^maxlen mod p by vectorized doubling (log2 rounds, no
    per-position Python loop)."""
    pw = np.array([1], dtype=np.int64)
    while len(pw) <= maxlen:
        bn = (int(pw[-1]) * _FP_B) % _FP_P  # B^len(pw): pw[k]*pw[k'] < 2^60
        pw = np.concatenate([pw, (pw * bn) % _FP_P])
    return pw[: maxlen + 1]


def modp_poly_hash(data: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Per-segment polynomial hash sum(byte[j] * B^(L-1-j)) mod p over
    raw bytes, fully vectorized. Segments may be empty (hash 0).
    Per-term products < 2^38 and per-segment sums < 2^43: exact int64."""
    lens = (ends - starts).astype(np.int64)
    n = len(lens)
    total = int(lens.sum())
    sums = np.zeros(n, dtype=np.int64)
    if total == 0:
        return sums
    pw = _mod_powers(int(lens.max()))
    seg0 = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
    within = np.arange(total, dtype=np.int64) - np.repeat(seg0, lens)
    pos = np.repeat(starts.astype(np.int64), lens) + within
    exp = np.repeat(lens, lens) - 1 - within
    terms = data[pos].astype(np.int64) * pw[exp] % _FP_P
    # reduceat over non-empty segments only: clipping empty-segment
    # boundaries into range would truncate the PREVIOUS doc's segment
    # whenever the batch ends with empty texts (r3 review finding)
    nz = lens > 0
    if nz.any():
        sums[nz] = np.add.reduceat(terms, seg0[nz])
    return sums % _FP_P


def fingerprint_mod_batch(batch: pa.Table) -> pa.Table:
    """SQL-reproducible content fingerprint: classic polynomial hash of
    the raw text bytes, same zero-copy buffer plumbing as
    ``fingerprint_batch`` but with arithmetic a DuckDB oracle replicates
    exactly (recursive-CTE power table + one grouped sum)."""
    from metacache_mpi_ray.functions.hashing import arrow_string_buffer

    data, starts, ends = arrow_string_buffer(batch["text"])
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fingerprint": pa.array(
                modp_poly_hash(data, starts, ends), type=pa.int64()
            ),
        }
    )

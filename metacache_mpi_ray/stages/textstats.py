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

"""Text extraction + normalization — the analog of the reference's
sequence decoding / canonicalization (/root/reference/src/dna_encoding.h).

All functions here are purely functional per row (no locale, no global
state, no arrival-order dependence) so the per-row invariant from
BASELINE.json holds: byte-identical extracted ``text`` per ``url``.
Version string: DedupConfig.normalization ("norm-v1").
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# --- HTML -> text extraction (deterministic, dependency-free) -------------

_RE_SCRIPT = re.compile(rb"<(script|style)\b[^>]*>.*?</\1\s*>", re.S | re.I)
_RE_COMMENT = re.compile(rb"<!--.*?-->", re.S)
_RE_TAG = re.compile(rb"<[^>]+>")
_RE_WS = re.compile(rb"[ \t\r\n\f\v]+")

_ENTITIES = {
    b"&amp;": b"&", b"&lt;": b"<", b"&gt;": b">",
    b"&quot;": b'"', b"&#39;": b"'", b"&apos;": b"'", b"&nbsp;": b" ",
}


def extract_text_from_html(html: bytes) -> str:
    """Deterministic HTML -> text: strip script/style/comments/tags,
    decode the common entities, collapse whitespace. Pure function of
    the input bytes (the analog of the reference's fixed 2-bit decode,
    dna_encoding.h:303-348 — same input, same output, always)."""
    if html is None:
        return ""
    b = _RE_SCRIPT.sub(b" ", html)
    b = _RE_COMMENT.sub(b" ", b)
    b = _RE_TAG.sub(b" ", b)
    for ent, rep in _ENTITIES.items():
        b = b.replace(ent, rep)
    b = _RE_WS.sub(b" ", b).strip()
    return b.decode("utf-8", errors="replace")


def normalize_text_arrow(col: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """norm-v1: utf8 lowercase + whitespace collapse + trim, vectorized
    in Arrow kernels (zero Python per row)."""
    x = pc.utf8_lower(col)
    x = pc.replace_substring_regex(x, pattern=r"\s+", replacement=" ")
    return pc.utf8_trim_whitespace(x)


def normalize_text_py(s: str) -> str:
    """Reference implementation of norm-v1 for oracles/tests (must agree
    byte-for-byte with normalize_text_arrow)."""
    return re.sub(r"\s+", " ", s.lower()).strip()


def resolve_text_batch(batch: pa.Table) -> pa.Table:
    """Fill null ``text`` from ``html`` via extract_text_from_html, then
    append norm-v1 ``norm_text``. Arrow in / Arrow out."""
    text = batch["text"]
    if text.null_count > 0 and "html" in batch.column_names:
        tvals = text.to_pylist()
        hvals = batch["html"].to_pylist()
        tvals = [
            t if t is not None else extract_text_from_html(h)
            for t, h in zip(tvals, hvals)
        ]
        text = pa.array(tvals, type=pa.string())
        batch = batch.set_column(batch.schema.get_field_index("text"), "text", text)
    norm = normalize_text_arrow(batch["text"])
    if isinstance(norm, pa.ChunkedArray):
        norm = norm.combine_chunks()
    return batch.append_column("norm_text", norm)


def texts_to_bytes(col) -> list[bytes]:
    """Arrow/numpy string column -> list of utf-8 byte strings."""
    if isinstance(col, (pa.Array, pa.ChunkedArray)):
        col = col.to_pylist()
    elif isinstance(col, np.ndarray):
        col = col.tolist()
    return [("" if s is None else s).encode("utf-8") for s in col]

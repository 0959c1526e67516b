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


def extract_text_html_arrow(col: pa.Array | pa.ChunkedArray):
    """Vectorized HTML -> text over an Arrow STRING column: the same
    deterministic pipeline as extract_text_from_html (strip script/
    style/comments/tags, decode common entities, collapse whitespace)
    as a chain of RE2 kernels — zero Python per row. Inline (?is) flags
    keep the patterns host-independent, so the identical chain is
    DuckDB-expressible for oracles. RE2 has no backreferences, hence
    separate script/style passes instead of <(script|style)>...</\\1>.
    """
    s = pc.replace_substring_regex(
        col, pattern=r"(?is)<script\b[^>]*>.*?</script\s*>", replacement=" "
    )
    s = pc.replace_substring_regex(
        s, pattern=r"(?is)<style\b[^>]*>.*?</style\s*>", replacement=" "
    )
    s = pc.replace_substring_regex(s, pattern=r"(?s)<!--.*?-->", replacement=" ")
    s = pc.replace_substring_regex(s, pattern=r"<[^>]+>", replacement=" ")
    for ent, rep in _ENTITIES.items():
        s = pc.replace_substring(s, pattern=ent.decode(), replacement=rep.decode())
    s = pc.replace_substring_regex(s, pattern=r"[ \t\r\n\f\v]+", replacement=" ")
    return pc.utf8_trim(s, characters=" \t\r\n\f\v")


def normalize_text_arrow(col: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """norm-v1: utf8 lowercase + whitespace collapse + trim, vectorized
    in Arrow kernels (zero Python per row)."""
    x = pc.utf8_lower(col)
    x = pc.replace_substring_regex(x, pattern=r"\s+", replacement=" ")
    return pc.utf8_trim_whitespace(x)


_WS_ASCII = re.compile(r"[ \t\r\n\f]+")  # RE2 \s = [\t\n\f\r ], NO \v


def normalize_text_py(s: str) -> str:
    """Reference implementation of norm-v1 for oracles/tests (must agree
    byte-for-byte with normalize_text_arrow). The whitespace class is
    the ASCII set RE2's \\s matches — Python's Unicode \\s would
    additionally collapse U+0085/U+00A0 etc. and diverge from the Arrow
    kernel and the DuckDB oracles (found by hypothesis)."""
    return _WS_ASCII.sub(" ", s.lower()).strip()


def resolve_text_batch(batch: pa.Table) -> pa.Table:
    """Fill null ``text`` from ``html`` via the vectorized Arrow HTML
    extractor (per-row Python only as a fallback for html bytes that are
    not valid UTF-8), then append norm-v1 ``norm_text``."""
    text = batch["text"]
    if text.null_count > 0 and "html" in batch.column_names:
        html = batch["html"]
        if isinstance(html, pa.ChunkedArray):
            html = html.combine_chunks()
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        try:
            # run the regex chain over ONLY the null-text rows (usually a
            # small fraction), then scatter the results back
            null_mask = pc.is_null(text)
            sub = extract_text_html_arrow(html.filter(null_mask).cast(pa.string()))
            text = pc.replace_with_mask(text, null_mask, sub)
        except pa.ArrowInvalid:
            # html not valid utf-8 -> per-row decode fallback
            tvals = text.to_pylist()
            hvals = html.to_pylist()
            text = pa.array(
                [
                    t if t is not None else extract_text_from_html(h)
                    for t, h in zip(tvals, hvals)
                ],
                type=pa.string(),
            )
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

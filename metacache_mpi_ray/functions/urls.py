"""URL canonicalization — the analog of the reference's robust
accession/id extraction before keying (/root/reference/src/
sequence_io.cpp:576-748: ~170 lines of prefix/format handling so that
the same sequence always maps to the same key). Web analog: the same
page reached via URL variants must hash to the same doc key.

Fully vectorized Arrow/RE2 kernel chain (no Python per row):

1. strip the fragment (``#...``);
2. lowercase the scheme+authority head (path/query stay case-sensitive
   per RFC 3986) and strip default ports (``:80`` http, ``:443`` https);
3. remove tracking query params (``utm_*``, ``fbclid``, ``gclid``),
   preserving separator structure for surviving params;
4. drop a dangling ``?`` / ``&``.

The same chain is expressible in DuckDB regexp functions (both engines
run RE2), which is how the ``url_canonical`` query is oracle-checked.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_HEAD = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*"
_TRACK = r"(utm_[^&=#]*|fbclid|gclid)"


def canonicalize_url_arrow(col: pa.Array | pa.ChunkedArray):
    """Vectorized canonical form of a URL string column. URLs without a
    scheme pass through steps 1, 3, 4 unchanged (no authority to fix)."""
    s = pc.replace_substring_regex(col, pattern=r"#.*$", replacement="")
    ex = pc.extract_regex(s, pattern=f"(?P<h>{_HEAD})")
    head = pc.struct_field(ex, "h")
    rest = pc.replace_substring_regex(s, pattern=_HEAD, replacement="")
    head_l = pc.utf8_lower(head)
    head_l = pc.replace_substring_regex(
        head_l, pattern=r"^(https://.*):443$", replacement=r"\1"
    )
    head_l = pc.replace_substring_regex(
        head_l, pattern=r"^(http://.*):80$", replacement=r"\1"
    )
    joined = pc.binary_join_element_wise(head_l, rest, "")
    s = pc.if_else(pc.is_valid(head), joined, s)
    # tracking params: a bounded number of passes handles runs of
    # consecutive tracking params (RE2 global replace does not rescan
    # replaced text; DuckDB behaves identically)
    for _ in range(3):
        s = pc.replace_substring_regex(
            s, pattern=rf"([?&]){_TRACK}=[^&#]*&", replacement=r"\1"
        )
    s = pc.replace_substring_regex(
        s, pattern=rf"([?&]){_TRACK}=[^&#]*$", replacement=""
    )
    return pc.replace_substring_regex(s, pattern=r"[?&]$", replacement="")


def duckdb_canonical_expr(col_expr: str) -> str:
    """DuckDB expression equivalent to canonicalize_url_arrow applied to
    ``col_expr`` — kept next to the kernel so the two stay in sync (the
    oracle of the ``url_canonical`` query uses it)."""
    s1 = f"(regexp_replace({col_expr}, '#.*$', ''))"
    headpat = "^([a-zA-Z][a-zA-Z0-9+.\\-]*://[^/?#]*)"
    headfix = (
        f"CASE WHEN regexp_extract({s1}, '{headpat}', 1) = '' THEN {s1} "
        f"ELSE regexp_replace(regexp_replace(lower("
        f"regexp_extract({s1}, '{headpat}', 1)), "
        f"'^(https://.*):443$', '\\1'), '^(http://.*):80$', '\\1') "
        f"|| regexp_replace({s1}, '{headpat}', '') END"
    )
    tr = "([?&])(utm_[^&=#]*|fbclid|gclid)=[^&#]*&"
    track3 = (
        f"regexp_replace(regexp_replace(regexp_replace(({headfix}), "
        f"'{tr}', '\\1', 'g'), '{tr}', '\\1', 'g'), '{tr}', '\\1', 'g')"
    )
    trackend = (
        f"regexp_replace(({track3}), '([?&])(utm_[^&=#]*|fbclid|gclid)=[^&#]*$', '')"
    )
    return f"regexp_replace(({trackend}), '[?&]$', '')"

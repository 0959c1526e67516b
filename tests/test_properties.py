"""Property-based invariants (hypothesis): the byte-stability contracts
the whole engine rests on — Arrow kernels must agree with the Python
reference implementations on arbitrary unicode input, and the zero-copy
buffer views must reproduce exact row bytes."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

texts = st.lists(
    st.text(max_size=80), min_size=0, max_size=20
)


@settings(max_examples=60, deadline=None)
@given(texts)
def test_normalize_arrow_matches_python(vals):
    from metacache_mpi_ray.functions.text import (
        normalize_text_arrow,
        normalize_text_py,
    )

    col = pa.array(vals, type=pa.string())
    got = normalize_text_arrow(col).to_pylist()
    assert got == [normalize_text_py(v) for v in vals]


@settings(max_examples=60, deadline=None)
@given(texts)
def test_arrow_string_buffer_roundtrip(vals):
    from metacache_mpi_ray.functions.hashing import arrow_string_buffer

    col = pa.array(vals, type=pa.string())
    data, starts, ends = arrow_string_buffer(col)
    for i, v in enumerate(vals):
        assert data[starts[i] : ends[i]].tobytes() == v.encode("utf-8")
    # large_string layout must agree byte-for-byte
    lcol = pa.array(vals, type=pa.large_string())
    ldata, ls, le = arrow_string_buffer(lcol)
    for i, v in enumerate(vals):
        assert ldata[ls[i] : le[i]].tobytes() == v.encode("utf-8")


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.binary(min_size=0, max_size=200), min_size=1, max_size=12),
    st.integers(min_value=2, max_value=24),
)
def test_shingle_buffer_matches_per_doc_rolling(docs, k):
    """Batch shingle hashing over the shared buffer == per-doc rolling
    hashing (windows never leak across row boundaries)."""
    from metacache_mpi_ray.functions.hashing import (
        concat_shingle_hashes,
        doc_hashes_from_buffer,
        rolling_shingle_hashes,
    )

    hashes, offsets = concat_shingle_hashes(docs, k, seed=3)
    for i, d in enumerate(docs):
        got = hashes[offsets[i] : offsets[i + 1]]
        buf = np.frombuffer(d, dtype=np.uint8)
        if len(d) >= k:
            exp = rolling_shingle_hashes(buf, k, seed=3)
            assert (got == exp).all()
        else:
            # short docs fall back to one whole-doc hash
            assert len(got) == 1


@settings(max_examples=40, deadline=None)
@given(st.text(max_size=120), st.text(max_size=120))
def test_lcs_hashed_bounds(a, b):
    from metacache_mpi_ray.stages.substring import lcs_len_hashed

    ab, bb = a.encode(), b.encode()
    l = lcs_len_hashed(ab, bb)
    assert 0 <= l <= min(len(ab), len(bb))
    if ab and ab == bb:
        assert l == len(ab)
    # symmetry
    assert l == lcs_len_hashed(bb, ab)

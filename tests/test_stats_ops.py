"""Unit tests: hash-LCS vs suffix-array parity, ambiguity filter,
grouped moments vs numpy."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def test_lcs_hashed_matches_suffix_array():
    from metacache_mpi_ray.stages.substring import (
        lcs_len_hashed,
        longest_common_substring_len,
    )

    rng = np.random.default_rng(9)
    alpha = list("abcdef ")
    for _ in range(25):
        a = "".join(rng.choice(alpha, size=int(rng.integers(1, 120))))
        b = "".join(rng.choice(alpha, size=int(rng.integers(1, 120))))
        # plant a shared span in half the cases
        if rng.random() < 0.5:
            span = "".join(rng.choice(alpha, size=int(rng.integers(5, 40))))
            ia = int(rng.integers(0, len(a)))
            ib = int(rng.integers(0, len(b)))
            a = a[:ia] + span + a[ia:]
            b = b[:ib] + span + b[ib:]
        ab, bb = a.encode(), b.encode()
        assert lcs_len_hashed(ab, bb) == longest_common_substring_len(ab, bb)
    assert lcs_len_hashed(b"", b"xyz") == 0
    assert lcs_len_hashed(b"same", b"same") == 4


def test_ambiguity_filter_drops_wide_buckets():
    from metacache_mpi_ray.stages.candidates import ambiguity_filter

    tab = pa.table(
        {
            "k": pa.array([1, 1, 1, 2, 2, 3], type=pa.int64()),
            "src": pa.array(["a", "b", "c", "a", "a", "z"]),
            "doc": pa.array([10, 11, 12, 13, 14, 15], type=pa.int64()),
        }
    )
    out = ambiguity_filter(rd.from_arrow(tab), "k", "src", max_sources=2).to_pandas()
    # k=1 spans 3 sources -> dropped entirely; k=2 (1 source), k=3 kept
    assert sorted(out["doc"]) == [13, 14, 15]
    # no-op when nothing is ambiguous
    out2 = ambiguity_filter(rd.from_arrow(tab), "k", "src", max_sources=5).to_pandas()
    assert len(out2) == 6


def test_grouped_moments_match_numpy():
    from metacache_mpi_ray.stages.stats import grouped_moments

    rng = np.random.default_rng(4)
    g = rng.integers(0, 3, size=500)
    x = rng.integers(1, 1000, size=500)
    tab = pa.table(
        {"g": pa.array(g, type=pa.int64()), "x": pa.array(x, type=pa.int64())}
    )
    out = (
        grouped_moments(rd.from_arrow(tab), ["g"], "x")
        .to_pandas()
        .set_index("g")
        .sort_index()
    )
    for gi in range(3):
        vals = x[g == gi].astype(np.float64)
        assert out.loc[gi, "n"] == len(vals)
        assert abs(out.loc[gi, "mean"] - vals.mean()) < 1e-9
        assert abs(out.loc[gi, "variance"] - vals.var()) < 1e-6
        sd = vals.std()
        skew = ((vals - vals.mean()) ** 3).mean() / sd**3
        assert abs(out.loc[gi, "skewness"] - skew) < 1e-9
    # global (ungrouped) moments
    gout = grouped_moments(rd.from_arrow(tab), None, "x").to_pandas()
    assert int(gout["n"][0]) == 500
    assert abs(gout["mean"][0] - x.mean()) < 1e-9

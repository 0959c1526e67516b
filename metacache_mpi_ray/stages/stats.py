"""Summary-statistics operators — the analog of the reference's
info-mode index statistics (/root/reference/src/mode_info.cpp:288-345)
built on accumulating moments (/root/reference/src/stat_moments.h):
mean / variance / skewness over grouped values via distributed power
sums — one hash-shuffle groupby carrying Sum(x), Sum(x²), Sum(x³),
Count; the higher moments are derived in a final vectorized map.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data.aggregate import Count, Sum


def grouped_moments(ds, group_cols, value_col: str):
    """-> per-group (group_cols..., n, sum_x, sum_x2, sum_x3 int64 and
    mean, variance, skewness float64). ``group_cols=None`` gives global
    moments. Integer power sums ride exactly (hash-stable for oracles);
    floats are derived views."""

    def powers(t: pa.Table) -> pa.Table:
        x = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {c: t[c] for c in (group_cols or [])}
        cols["__x"] = pa.array(x, type=pa.int64())
        cols["__x2"] = pa.array(x * x, type=pa.int64())
        cols["__x3"] = pa.array(x * x * x, type=pa.int64())
        return pa.table(cols)

    key = group_cols if group_cols else None
    agg = (
        ds.map_batches(powers, batch_format="pyarrow")
        .groupby(key)
        .aggregate(
            Count(alias_name="n"),
            Sum("__x", alias_name="sum_x"),
            Sum("__x2", alias_name="sum_x2"),
            Sum("__x3", alias_name="sum_x3"),
        )
    )

    def derive(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        s1 = t["sum_x"].to_numpy(zero_copy_only=False).astype(np.float64)
        s2 = t["sum_x2"].to_numpy(zero_copy_only=False).astype(np.float64)
        s3 = t["sum_x3"].to_numpy(zero_copy_only=False).astype(np.float64)
        mean = s1 / n
        var = np.maximum(s2 / n - mean**2, 0.0)
        # E[(x-µ)³] = s3/n - 3µ s2/n + 2µ³ ; skew = m3 / σ³
        m3 = s3 / n - 3 * mean * s2 / n + 2 * mean**3
        sd = np.sqrt(var)
        skew = np.where(sd > 0, m3 / np.where(sd > 0, sd, 1.0) ** 3, 0.0)
        out = {c: t[c] for c in t.column_names}
        out["mean"] = pa.array(mean, type=pa.float64())
        out["variance"] = pa.array(var, type=pa.float64())
        out["skewness"] = pa.array(skew, type=pa.float64())
        return pa.table(out)

    return agg.map_batches(derive, batch_format="pyarrow")

"""Grouped / windowed operators over the ordered event log.

Ray Data has no event-time window primitives; windows are expressed as
key + bucket groupbys or per-key sorted map_groups (ray_guide
"Streaming-shaped workloads"). Ordering assumption: within one group
the UDF sorts by ts itself — global arrival order is never relied on
(SURVEY.md §2.9 determinism note).

Reference analogs: per-group top-k = the bounded candidate list (A2,
/root/reference/src/candidates.h:191-289); windowed hit counting = A1
(candidates.h:118-180).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def topk_per_group(
    ds,
    group_col: str,
    order_col: str,
    k: int,
    *,
    descending: bool = True,
    tiebreak: list[str] | None = None,
):
    """Per-group bounded top-k with deterministic tie-break columns
    (partial top-k comes free: map_groups sees the whole group after
    the shuffle)."""
    tiebreak = tiebreak or []

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            [order_col] + tiebreak,
            ascending=[not descending] + [True] * len(tiebreak),
        ).head(k)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return ds.groupby(group_col).map_groups(per_group, batch_format="pandas")


def lag_per_group(ds, group_col: str, ts_col: str, value_col: str, out_col: str = "prev_value"):
    """Per-key previous-row value in ts order (LAG window function)."""

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col]).copy()
        g[out_col] = g[value_col].shift(1)
        return g

    return ds.groupby(group_col).map_groups(per_group, batch_format="pandas")


def sessionize(ds, group_col: str, ts_col: str, gap_us: int = 1800_000_000):
    """Session windows per key: a new session starts when the gap to the
    previous event exceeds ``gap_us``. Emits per-session aggregates
    (session_id, n_events, t_start, t_end)."""

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col])
        ts = g[ts_col].astype("int64").to_numpy()
        new = np.ones(len(ts), dtype=bool)
        if len(ts) > 1:
            new[1:] = (ts[1:] - ts[:-1]) > gap_us
        sid = np.cumsum(new) - 1
        out = pd.DataFrame(
            {
                group_col: g[group_col].to_numpy(),
                "session_id": sid,
                "ts": ts,
            }
        )
        agg = out.groupby("session_id").agg(
            n_events=("ts", "size"), t_start=("ts", "min"), t_end=("ts", "max")
        ).reset_index()
        agg[group_col] = g[group_col].iloc[0]
        return agg[[group_col, "session_id", "n_events", "t_start", "t_end"]]

    return ds.groupby(group_col).map_groups(per_group, batch_format="pandas")


def tumbling_window_agg(ds, group_col: str, ts_col: str, width_us: int, aggs: list):
    """Tumbling event-time windows via key+bucket groupby (the scalable
    form: no per-key state, one shuffle)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def add_window(t: pa.Table) -> pa.Table:
        win = pc.divide(t[ts_col].cast(pa.int64()), width_us)
        return t.append_column("window_id", win)

    return ds.map_batches(add_window, batch_format="pyarrow").groupby(
        [group_col, "window_id"]
    ).aggregate(*aggs)

"""Stage-sizing helpers: size actor pools so they never starve the
other pipeline stages (reads, shuffles) of CPUs."""

from __future__ import annotations

import ray


def default_actor_concurrency(reserve: int = 2, cap: int | None = None) -> int:
    """Actor-pool size that leaves ``reserve`` CPUs for stateless tasks.

    An actor pool reserves its CPUs even while idle; a pool sized to the
    whole node deadlocks the streaming executor (reads can never run).
    """
    try:
        total = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        total = 4
    c = max(1, total - reserve)
    if cap is not None:
        c = min(c, cap)
    return c

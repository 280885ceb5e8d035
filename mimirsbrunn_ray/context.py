"""Execution-context helpers: pool sizing and DataContext tuning.

Per SURVEY.md §4: stage pools must never reserve every CPU or the read /
shuffle / write stages starve and the pipeline serializes. Default pool
size is half the cluster CPUs (min 2), leaving headroom for the stateless
stages the streaming executor runs concurrently.
"""

from __future__ import annotations

import ray


# Auto-switch budget for the coalesce-to-one-task fast path used by
# gap-fill / compression finals: below this many tier rows, one pandas
# task beats Ray's sort-based map_groups fixed overhead; above it the
# per-key distributed shuffle path takes over (same budget discipline as
# simjoin's `auto` and the neardup clusterers — VERDICT r4 item 1).
SINGLE_PARTITION_ROW_BUDGET = 2_000_000


def pool_size(frac: float = 0.5, minimum: int = 2) -> int:
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(minimum, int(cpus * frac))


def quiet_data_context() -> None:
    """Silence progress bars / verbose logs (bench + tests)."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    try:
        ctx.execution_options.verbose_progress = False
    except Exception:
        pass

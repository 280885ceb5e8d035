"""Run counters — the graft of the reference's import metrics.

The reference counts per-country rows while streaming
(/root/reference/src/addr_reader.rs:33-65,75-81) and ok/error docs per bulk
chunk with a hard error budget (libs/mimir/src/rubber.rs:660-745). Here every
stage increments a zero-CPU counter actor fire-and-forget; the driver reads
the totals into the tier manifest at commit time and enforces the error
budget there.
"""

from __future__ import annotations

from collections import Counter

import ray


@ray.remote(num_cpus=0)
class CounterActor:
    """Cluster-wide additive counters. ``inc`` is fire-and-forget per batch."""

    def __init__(self) -> None:
        self._c: Counter = Counter()

    def inc(self, deltas: dict) -> None:
        self._c.update(deltas)

    def totals(self) -> dict:
        return dict(self._c)

    def reset(self) -> None:
        self._c.clear()


def new_counters() -> "ray.actor.ActorHandle":
    return CounterActor.remote()


def totals(handle, settle: bool = True) -> dict:
    """Read counter totals. ``inc`` is fire-and-forget, so a just-finished
    stage's last increments may still be in flight; with ``settle`` we poll
    until two consecutive reads agree (delivery is sub-ms in practice)."""
    if handle is None:
        return {}
    import time

    prev = ray.get(handle.totals.remote())
    if not settle:
        return prev
    for _ in range(50):
        time.sleep(0.05)
        cur = ray.get(handle.totals.remote())
        if cur == prev:
            return cur
        prev = cur
    return prev


class ErrorBudgetExceeded(RuntimeError):
    """Raised at commit when dropped rows exceed the configured budget —
    the analog of max_bulk_errors aborting the job
    (/root/reference/libs/mimir/src/rubber.rs:324,736-744)."""

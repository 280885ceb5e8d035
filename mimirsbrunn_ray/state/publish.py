"""Atomic tiered publish — the zero-downtime alias-swap graft.

The reference writes every import to a fresh dated physical index
``munin_{type}_{dataset}_{timestamp}`` (/root/reference/libs/mimir/src/
rubber.rs:134-161), bulk-loads it, then atomically repoints the read aliases
in a single ``_aliases`` call and deletes superseded indexes
(rubber.rs:553-636). Failed runs leave "ghost" indexes that the next publish
cleans (tests/rubber_test.rs:239).

Here: each tier run writes fully under ``{root}/{tier}/run={run_id}/``,
commits its manifest, then atomically rewrites ``{root}/{tier}/LATEST.json``
(tmp file + os.replace) to point at the new run. Readers only ever follow
LATEST.json -> a fully-written run dir. ``cleanup_ghosts`` deletes
uncommitted or superseded run dirs; ``latest``/``is_tier_committed`` are the
resume boundary (SURVEY.md §4 checkpoint row).
"""

from __future__ import annotations

import json
import os
import shutil

import ray.data as rd

from mimirsbrunn_ray.state.manifest import is_committed, read_manifest, write_manifest

LATEST_NAME = "LATEST.json"


class TierStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- paths -----------------------------------------------------------
    def tier_dir(self, tier: str) -> str:
        return os.path.join(self.root, tier)

    def run_dir(self, tier: str, run_id: str) -> str:
        return os.path.join(self.tier_dir(tier), f"run={run_id}")

    # -- read side -------------------------------------------------------
    def latest(self, tier: str) -> dict | None:
        p = os.path.join(self.tier_dir(tier), LATEST_NAME)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def latest_run_dir(self, tier: str) -> str | None:
        latest = self.latest(tier)
        return latest["run_dir"] if latest else None

    def latest_segments(self, tier: str) -> list[str]:
        """Run dirs whose union IS the tier (additive segments — a late
        merge appends a segment instead of rewriting petabytes)."""
        latest = self.latest(tier)
        if latest is None:
            return []
        return latest.get("segments") or [latest["run_dir"]]

    def latest_data_paths(self, tier: str) -> list[str]:
        """Parquet files of the latest committed run (for the next tier's
        read — the reference's read-own-published-index pattern, S9)."""
        segments = self.latest_segments(tier)
        if not segments:
            raise FileNotFoundError(f"no committed run for tier {tier!r}")
        out = []
        for seg in segments:
            m = read_manifest(seg)
            out.extend(os.path.join(seg, p["key"]) for p in m["partitions"])
        return out

    def run_data_paths(self, tier: str, run_id: str) -> list[str]:
        """Parquet files of a SPECIFIC committed run — time-travel reads
        over the retention window (the reference keeps superseded dated
        indexes until cleanup for exactly this rollback/inspect use;
        rubber.rs:553-636). Raises for unknown or uncommitted runs; runs
        older than the ``keep_runs`` retention are gone by design."""
        run_dir = self.run_dir(tier, run_id)
        if not os.path.isdir(run_dir) or not is_committed(run_dir):
            raise FileNotFoundError(
                f"no committed run {run_id!r} for tier {tier!r} "
                "(outside the retention window?)"
            )
        m = read_manifest(run_dir)
        return [os.path.join(run_dir, p["key"]) for p in m["partitions"]]

    def is_run_committed(self, tier: str, run_id: str) -> bool:
        latest = self.latest(tier)
        return bool(
            latest
            and latest.get("run_id") == run_id
            and is_committed(latest["run_dir"])
        )

    # -- write side ------------------------------------------------------
    def publish(
        self,
        ds: "rd.Dataset",
        tier: str,
        run_id: str,
        input_paths: list[str] | None = None,
        counters: dict | None = None,
        partition_cols: list[str] | None = None,
        max_dropped: int | None = None,
        keep_runs: int = 2,
        append_segment: bool = False,
        allow_overwrite_live: bool = False,
        codec: str = "zstd",
        extra_ds_fn=None,
    ) -> str:
        """Write ds -> run dir, commit manifest, swap LATEST atomically.

        ``counters`` may be a plain dict or a CounterActor handle; a handle
        is read AFTER the write completes (the dataset is lazy — counts only
        exist once every stage has run).

        ``extra_ds_fn``: evaluated AFTER the main write and before the
        manifest commit; a returned Dataset is written into the SAME run
        dir (used by the untrusted-dedup spill: the winners of the
        duplicate-key side channel join the tier atomically — readers
        still only ever see the committed whole).
        """
        from mimirsbrunn_ray.state.metrics import ErrorBudgetExceeded, totals

        run_dir = self.run_dir(tier, run_id)
        if os.path.exists(run_dir):
            # a LIVE segment (still referenced by LATEST) must never be
            # clobbered: rewriting it would delete committed rows readers
            # depend on — callers must use a fresh run_id (or skip, the
            # is_run_committed resume path)
            if run_dir in self.latest_segments(tier) and not allow_overwrite_live:
                raise ValueError(
                    f"refusing to overwrite live run dir {run_dir!r} "
                    f"(still referenced by {tier}/LATEST.json)"
                )
            shutil.rmtree(run_dir)  # ghost from a killed run — rewrite it
        kwargs = {}
        if partition_cols:
            kwargs["partition_cols"] = partition_cols
        # codec is a per-tier knob: near-random token payloads compress
        # barely better under zstd than lz4 (measured 731 vs 758 MiB on the
        # 2M-row bench corpus, 3.6%) while writing ~1.5x slower — callers
        # pick lz4 for HOT tiers that the next stage re-reads immediately
        # and keep zstd (default) for cold/long-retention tiers, the
        # classic hot/cold TSDB block compression split
        ds.write_parquet(run_dir, compression=codec, **kwargs)
        if extra_ds_fn is not None:
            extra = extra_ds_fn()
            if extra is not None:
                extra.write_parquet(run_dir, compression=codec, **kwargs)
        if os.environ.get("GRAFT_SIGKILL_BEFORE_COMMIT") == tier:
            # crash-injection hook (tests/test_kill9_resume.py): a REAL
            # SIGKILL between the data write and the manifest/LATEST
            # commit — the widest uncommitted window. The dir left behind
            # is exactly the ghost a power-cut run leaves
            # (reference crash test: tests/rubber_test.rs:239).
            import signal

            os.kill(os.getpid(), signal.SIGKILL)
        if counters is not None and not isinstance(counters, dict):
            counters = totals(counters)
        counters = dict(counters or {})
        if max_dropped is not None:
            dropped = counters.get("rows_dropped_dirty", 0)
            if dropped > max_dropped:
                shutil.rmtree(run_dir)  # never publish a failed run
                raise ErrorBudgetExceeded(
                    f"tier {tier}: {dropped} dropped rows > budget {max_dropped}"
                )
        previous = self.latest(tier)
        write_manifest(
            run_dir,
            run_id=run_id,
            tier=tier,
            input_paths=input_paths or [],
            counters=counters,
            previous_run=(previous or {}).get("run_id"),
            committed=True,
        )
        segments = [run_dir]
        if append_segment:
            segments = [
                s for s in self.latest_segments(tier) if s != run_dir
            ] + [run_dir]
        self._swap_latest(tier, run_id, run_dir, segments)
        self.cleanup_ghosts(tier, keep_runs=keep_runs)
        return run_dir

    def _swap_latest(
        self, tier: str, run_id: str, run_dir: str, segments: list[str] | None = None
    ) -> None:
        tier_dir = self.tier_dir(tier)
        os.makedirs(tier_dir, exist_ok=True)
        tmp = os.path.join(tier_dir, LATEST_NAME + ".tmp")
        with open(tmp, "w") as f:
            json.dump(
                {
                    "run_id": run_id,
                    "run_dir": run_dir,
                    "segments": segments or [run_dir],
                },
                f,
            )
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(tier_dir, LATEST_NAME))

    def cleanup_ghosts(self, tier: str, keep_runs: int = 2) -> list[str]:
        """Delete uncommitted run dirs and old runs beyond the retention
        count (never the one LATEST points at)."""
        tier_dir = self.tier_dir(tier)
        if not os.path.isdir(tier_dir):
            return []
        latest = self.latest(tier)
        latest_dir = latest["run_dir"] if latest else None
        protected = set(self.latest_segments(tier))  # segments stay live

        def commit_time(d: str) -> float:
            """Order runs by COMMIT time (manifest mtime), not by name —
            'run=r10' sorts lexicographically before 'run=r9' and name
            order would retire the newer run."""
            m = os.path.join(tier_dir, d, "_manifest.json")
            try:
                return os.path.getmtime(m)
            except OSError:
                return 0.0

        runs = sorted(
            (
                d
                for d in os.listdir(tier_dir)
                if d.startswith("run=") and os.path.isdir(os.path.join(tier_dir, d))
            ),
            key=commit_time,
        )
        removed = []
        committed = []
        for d in runs:
            full = os.path.join(tier_dir, d)
            if full == latest_dir or full in protected:
                committed.append(full)
                continue
            if not is_committed(full):
                shutil.rmtree(full)
                removed.append(full)
            else:
                committed.append(full)
        # retention: keep newest `keep_runs` committed dirs (incl. latest);
        # never a live segment
        excess = [d for d in committed if d != latest_dir and d not in protected][
            : max(0, len(committed) - keep_runs)
        ]
        for full in excess:
            shutil.rmtree(full)
            removed.append(full)
        return removed

    def compact(
        self,
        tier: str,
        run_id: str,
        keep_runs: int = 2,
        num_blocks: int | None = None,
    ) -> str:
        """Merge every live segment of a tier into ONE fresh run — the
        LSM-style maintenance job that bounds read fan-in after late-data
        appends (each ``append_segment`` publish adds one more directory
        every reader must union; compaction restores single-run reads).

        Zero-downtime by construction: the union is read from the
        COMMITTED segments, written under a NEW run dir, and LATEST swaps
        atomically — readers either see the old segment list or the
        compacted run, never a partial state. A killed compaction leaves
        a ghost dir the next publish/cleanup removes; re-running with the
        same run_id is safe (the ghost is rewritten). Superseded
        segments retire through the normal ``cleanup_ghosts`` retention,
        so an in-flight reader of the old list keeps its files for
        ``keep_runs`` more publishes.

        Segment manifests' counters are summed into the compacted
        manifest (lineage: ``input_paths`` = the source segment dirs).
        """
        segments = self.latest_segments(tier)
        if not segments:
            raise FileNotFoundError(f"no committed run for tier {tier!r}")
        data_paths = self.latest_data_paths(tier)
        merged_counters: dict = {}
        for seg in segments:
            m = read_manifest(seg)
            for k, v in (m.get("counters") or {}).items():
                if isinstance(v, (int, float)):
                    merged_counters[k] = merged_counters.get(k, 0) + v
        kwargs = {}
        if num_blocks is not None:
            kwargs["override_num_blocks"] = num_blocks
        ds = rd.read_parquet(data_paths, **kwargs)
        return self.publish(
            ds,
            tier,
            run_id,
            input_paths=segments,
            counters=merged_counters,
            keep_runs=keep_runs,
        )

"""Late-data merge: rows arriving after their tiers were committed.

Graft of the reference's cross-run stop merge — new data unioned with the
already-published index, merged by key, republished atomically under a new
run id that supersedes the old one (/root/reference/src/stops.rs:195-226 +
the alias swap). Rollups are ASSOCIATIVE (count/sum/min/max), so late rows
never force a raw-tier rescan:

  1. validate + dedup the late rows against the published raw tier's keys
     (claims against already-seen doc_ids drop duplicates);
  2. new raw run = published raw parquet UNION late rows (the published
     files are immutable — the union is dataset-level, no rewrite of old
     partitions);
  3. new 1m = combine(published non-filled 1m partials, partial(late rows))
     -> re-gap-fill; 1h/1d/compressed re-derive from the (tiny) 1m tier.

Every tier is republished with LATEST swapped atomically; readers never see
a half-merged state.
"""

from __future__ import annotations

import ray.data as rd

from mimirsbrunn_ray.sources.ingest import num_blocks_for, read_sequences, validated
from mimirsbrunn_ray.stages.compress import compress_tier
from mimirsbrunn_ray.stages.dedup import scan_duplicate_keys
from mimirsbrunn_ray.stages.gapfill import gapfill
from mimirsbrunn_ray.stages.rollup import (
    _combine_rollup_partials,
    _finish,
    _partial_from_raw,
    rollup,
    tree_merge,
)
from mimirsbrunn_ray.state.metrics import new_counters
from mimirsbrunn_ray.state.publish import TierStore


def merge_late_data(
    late_paths,
    out_root: str,
    run_id: str,
    gap_policy: str = "locf",
) -> dict:
    """Fold late rows into all published tiers under a new run id."""
    store = TierStore(out_root)
    late_paths = list(late_paths) if isinstance(late_paths, (list, tuple)) else [late_paths]
    summary: dict = {"run_id": run_id, "tiers": {}}

    # ---- raw: union published files + validated late rows ---------------
    counters = new_counters()
    published_raw = store.latest_data_paths("raw")
    late = validated(read_sequences(late_paths), counters=counters)

    # dedup late rows against themselves AND against published ids: the
    # published raw tier is already unique, so only late ids that collide
    # with published ids (or each other) need dropping — an anti-join by
    # key hash against the published key set (SURVEY.md §2.5 semi/anti).
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from mimirsbrunn_ray.stages.dedup import _hash64

    pub_ids = rd.read_parquet(published_raw, columns=["doc_id"])

    def hash_batch(b: pa.Table) -> pa.Table:
        return pa.table({"h": _hash64(b["doc_id"]).view(np.int64)})

    pub_hashes = np.sort(
        np.concatenate(
            [
                b["h"].to_numpy(zero_copy_only=False)
                for b in pub_ids.map_batches(
                    hash_batch, batch_format="pyarrow", batch_size=None
                ).iter_batches(batch_format="pyarrow", batch_size=1 << 20)
            ]
        )
    )
    late_dups = scan_duplicate_keys(late_paths, key="doc_id")

    import ray

    pub_ref = ray.put(pub_hashes)

    class DropSeen:
        def __init__(self):
            self.pub = ray.get(pub_ref)
            self.seen: set = set()  # in-late duplicates (late sets are small)

        def __call__(self, b: pa.Table) -> pa.Table:
            h = _hash64(b["doc_id"]).view(np.int64)
            pos = np.clip(np.searchsorted(self.pub, h), 0, max(0, len(self.pub) - 1))
            dup_pub = (self.pub[pos] == h) if len(self.pub) else np.zeros(len(h), bool)
            keep = ~dup_pub
            if len(late_dups):
                ids = b["doc_id"].to_pylist()
                for i, d in enumerate(ids):
                    if keep[i] and d in self.seen:
                        keep[i] = False
                    elif keep[i]:
                        self.seen.add(d)
            n_drop = int((~keep).sum())
            if n_drop and counters is not None:
                counters.inc.remote({"rows_deduped": n_drop})
            return b.filter(pa.array(keep))

    late_clean = late.map_batches(
        DropSeen, batch_format="pyarrow", batch_size=None, concurrency=1
    ).materialize()
    summary["late_rows_merged"] = late_clean.count()

    # append-only segment: ONLY the late rows are written; the petabyte-scale
    # published raw files are referenced, never rewritten
    run_dir = store.publish(late_clean, "raw", run_id, input_paths=late_paths,
                            counters=counters, append_segment=True)
    summary["tiers"]["raw"] = {"run_dir": run_dir}

    # ---- 1m: associative combine of published partials + late partials --
    counters = new_counters()
    pub_1m = rd.read_parquet(store.latest_data_paths("1m"))

    def pub_to_partials(b: pa.Table) -> pa.Table:
        b = b.filter(pc.fill_null(pc.invert(b["filled"]), True))
        return pa.table(
            {
                "source": b["source"],
                "bucket": b["bucket"],
                "n_rows": b["n_rows"].cast(pa.int64()),
                "sum_tok": b["sum_tok"].cast(pa.int64()),
                "min_tok": b["min_tok"].cast(pa.int64()),
                "max_tok": b["max_tok"].cast(pa.int64()),
            }
        )

    late_partials = late_clean.map_batches(
        lambda b: _partial_from_raw(b, "1m"), batch_format="pyarrow", batch_size=None
    )
    all_partials = pub_1m.map_batches(
        pub_to_partials, batch_format="pyarrow", batch_size=None
    ).union(late_partials)
    t1m = tree_merge(all_partials, _combine_rollup_partials).map_batches(
        _finish, batch_format="pyarrow", batch_size=None
    )
    t1m = gapfill(t1m, "1m", policy=gap_policy, counters=counters).materialize()
    run_dir = store.publish(t1m, "1m", run_id,
                            input_paths=[store.latest_run_dir("raw")],
                            counters=counters)
    summary["tiers"]["1m"] = {"run_dir": run_dir}

    # ---- 1h / 1d / compressed re-derive from the small 1m tier ----------
    prev = t1m
    for gran, src_gran in (("1h", "1m"), ("1d", "1h")):
        counters = new_counters()
        t = gapfill(
            rollup(prev, gran, from_tier=src_gran), gran,
            policy=gap_policy, counters=counters,
        ).materialize()
        run_dir = store.publish(t, gran, run_id,
                                input_paths=[store.latest_run_dir(src_gran)],
                                counters=counters)
        summary["tiers"][gran] = {"run_dir": run_dir}
        prev = t

    blocks = compress_tier(t1m.select_columns(["source", "bucket", "sum_tok"]))
    run_dir = store.publish(blocks, "compressed", run_id,
                            input_paths=[store.latest_run_dir("1m")])
    summary["tiers"]["compressed"] = {"run_dir": run_dir}
    return summary

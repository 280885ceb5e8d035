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

import os

import ray.data as rd

from mimirsbrunn_ray.sources.ingest import read_sequences, validated
from mimirsbrunn_ray.stages.compress import compress_tier
from mimirsbrunn_ray.stages.dedup import dedup_exact
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
    """Fold late rows into all published tiers under a new run id.

    Idempotent: if ``run_id`` is already the committed raw run, the merge
    already happened (a crash between tier publishes re-runs the job) and
    re-anti-joining the late rows against their own published segment would
    silently delete them — so the raw step is skipped and only the
    derived tiers are (re)computed from the published raw tier.
    """
    store = TierStore(out_root)
    late_paths = list(late_paths) if isinstance(late_paths, (list, tuple)) else [late_paths]
    summary: dict = {"run_id": run_id, "tiers": {}}

    import pyarrow as pa
    import pyarrow.compute as pc

    raw_done = store.is_run_committed("raw", run_id)
    if raw_done:
        # resume path: late rows are already a published raw segment
        summary["tiers"]["raw"] = {"skipped": "already committed"}
        # path-PREFIX match, not substring: "run=r1" must not also select
        # "run=r10"'s files
        run_prefix = store.run_dir("raw", run_id).rstrip(os.sep) + os.sep
        late_clean = rd.read_parquet(
            [p for p in store.latest_data_paths("raw")
             if p.startswith(run_prefix)]
        ).materialize()
        summary["late_rows_merged"] = late_clean.count()
    else:
        # ---- raw: union published files + validated late rows -----------
        counters = new_counters()
        published_raw = store.latest_data_paths("raw")
        late = validated(read_sequences(late_paths), counters=counters).materialize()
        n_late = late.count()

        # dedup late rows against themselves AND against published ids.
        # In-late duplicates: the deterministic keep-first hash-bucket dedup.
        # Against published ids: a PARTITIONED key-only anti-join — both
        # sides' doc_id columns hash-shuffle into a distributed inner join
        # whose output is just the COLLIDING keys (token payloads never
        # enter the shuffle; no node or the driver ever holds the published
        # key set — replaces the old driver-side concatenate-all-published-
        # hashes build). The collision set is bounded by the late batch
        # size, so broadcasting it back as a filter is safe.
        from mimirsbrunn_ray.context import pool_size

        deduped = dedup_exact(late, key="doc_id", num_buckets=16)
        pub_ids = rd.read_parquet(published_raw, columns=["doc_id"])

        def key_only(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "doc_id" not in b.schema.names:
                return pa.table({"doc_id": pa.array([], pa.string())})
            return pa.table({"doc_id": b["doc_id"]})

        # the repartition squashes the SCHEMA-LESS empty blocks that
        # hash-bucketed map_groups emits for empty bucket partitions —
        # Ray forwards those around map_batches UDFs, and a schema-less
        # block reaching a shuffle-join partition crashes its
        # pa.Table.join ("no match for key field"). Key-only rows are
        # 8-byte-per-row bounded by the late batch, so the reshuffle is
        # cheap at any scale.
        collisions = (
            deduped.map_batches(
                key_only, batch_format="pyarrow", batch_size=None
            )
            .repartition(max(2, pool_size()))
            .join(
                pub_ids,
                join_type="inner",
                num_partitions=max(8, pool_size()),
                on=("doc_id",),
            )
            .take_all()
        )
        if collisions:
            collide_arr = pa.array(
                [r["doc_id"] for r in collisions]
            )
            late_clean = deduped.map_batches(
                lambda b: b.filter(
                    pc.invert(
                        pc.fill_null(
                            pc.is_in(b["doc_id"], value_set=collide_arr), False
                        )
                    )
                ),
                batch_format="pyarrow",
                batch_size=None,
            ).materialize()
        else:
            late_clean = deduped.materialize()
        n_clean = late_clean.count()
        counters.inc.remote({"rows_deduped": n_late - n_clean})
        summary["late_rows_merged"] = n_clean

        # append-only segment: ONLY the late rows are written; the
        # petabyte-scale published raw files are referenced, never rewritten
        run_dir = store.publish(late_clean, "raw", run_id,
                                input_paths=late_paths,
                                counters=counters, append_segment=True)
        summary["tiers"]["raw"] = {"run_dir": run_dir}

    # ---- 1m: associative combine of published partials + late partials --
    if store.is_run_committed("1m", run_id):
        summary["tiers"]["1m"] = {"skipped": "already committed"}
        t1m = rd.read_parquet(store.latest_data_paths("1m")).materialize()
    else:
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
            lambda b: _partial_from_raw(b, "1m"), batch_format="pyarrow",
            batch_size=None,
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
        if store.is_run_committed(gran, run_id):
            summary["tiers"][gran] = {"skipped": "already committed"}
            prev = rd.read_parquet(store.latest_data_paths(gran)).materialize()
            continue
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

    if store.is_run_committed("compressed", run_id):
        summary["tiers"]["compressed"] = {"skipped": "already committed"}
    else:
        blocks = compress_tier(
            t1m.select_columns(["source", "bucket", "sum_tok"])
        )
        run_dir = store.publish(blocks, "compressed", run_id,
                                input_paths=[store.latest_run_dir("1m")])
        summary["tiers"]["compressed"] = {"run_dir": run_dir}
    return summary

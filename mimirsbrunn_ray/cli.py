"""CLI entry points — the analog of the reference's importer binaries
(bano2mimir / osm2mimir / ... share one launch harness,
/root/reference/src/utils.rs:74-100). One process owns the Ray session;
subcommands compose the library.

  python -m mimirsbrunn_ray.cli generate  --out DIR --rows N [--files K]
  python -m mimirsbrunn_ray.cli tier      --input GLOB --out ROOT --run-id ID
  python -m mimirsbrunn_ray.cli merge-late --input GLOB --out ROOT --run-id ID
  python -m mimirsbrunn_ray.cli query     --root ROOT (top-k|lookup|as-of|status) ...
"""

from __future__ import annotations

import argparse
import glob
import json
import sys


def _ray_session(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from mimirsbrunn_ray.context import quiet_data_context

    quiet_data_context()
    return ray


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="mimirsbrunn_ray")
    p.add_argument("--num-cpus", type=int, default=8)
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="write a deterministic synthetic corpus")
    g.add_argument("--out", required=True)
    g.add_argument("--rows", type=int, required=True)
    g.add_argument("--files", type=int, default=8)
    g.add_argument("--seed", type=int, default=42)

    t = sub.add_parser("tier", help="run the full tier chain (resumable)")
    t.add_argument("--config", help="job TOML (defaults <- file <- flags)")
    t.add_argument("--input", help="input path or glob: parquet, csv[.gz], tsv, jsonl")
    t.add_argument("--out")
    t.add_argument("--run-id")
    t.add_argument("--gap-policy", default=None, choices=["locf", "linear"])
    t.add_argument("--max-dropped", type=int, default=None)
    t.add_argument(
        "--multi-partition", action="store_true",
        help="use the sharded final combines instead of the bounded "
             "repartition(1) path (the unbounded-scale route)",
    )
    t.add_argument(
        "--dedup-scan-shards", type=int, default=None,
        help="override the byte-sized auto-sharding of the dup-scan combine",
    )
    t.add_argument(
        "--quarantine", default=None,
        help="also write dropped-dirty rows (+ reason column) as parquet "
             "under this directory (forces the standalone validation path)",
    )
    t.add_argument(
        "--rollup-shards", type=int, default=None,
        help="shard the raw->1m rollup's final partial combine "
             "(default: auto by raw-tier row count; 1 = serial combine)",
    )

    m = sub.add_parser("merge-late", help="fold late rows into published tiers")
    m.add_argument("--input", required=True)
    m.add_argument("--out", required=True)
    m.add_argument("--run-id", required=True)

    c = sub.add_parser(
        "compact",
        help="merge a tier's live segments into one fresh run (LSM-style "
             "maintenance after late-data appends; atomic swap)",
    )
    c.add_argument("--root", required=True)
    c.add_argument("--tier", required=True)
    c.add_argument("--run-id", required=True)
    c.add_argument("--keep-runs", type=int, default=2)

    s = sub.add_parser(
        "serve",
        help="HTTP query daemon over published tiers (the bragi-daemon "
             "graft: /autocomplete /features/<id> /reverse /status with "
             "per-request weight overrides)",
    )
    s.add_argument("--root", required=True)
    s.add_argument("--port", type=int, default=4000)

    q = sub.add_parser("query", help="read API over published tiers")
    q.add_argument("--root", required=True)
    q.add_argument("action", choices=["top-k", "lookup", "as-of", "status"])
    q.add_argument("--tier", default="1m")
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--source")
    q.add_argument("--doc-id")
    q.add_argument("--ts-us", type=int)
    q.add_argument("--lang", help="response language (i18n names map)")
    q.add_argument("--debug", action="store_true",
                   help="per-result score-explanation breakdown")

    args = p.parse_args(argv)

    if args.cmd == "generate":
        ray = _ray_session(args.num_cpus)
        from mimirsbrunn_ray.sources.synth import generate_sequences

        meta = generate_sequences(args.out, args.rows, n_files=args.files,
                                  seed=args.seed)
        print(json.dumps({k: v for k, v in meta.items()
                          if not isinstance(v, list)}))
        ray.shutdown()
        return 0

    if args.cmd == "tier":
        if args.config:
            from mimirsbrunn_ray.config import load_job_config

            job = load_job_config(
                args.config, input=args.input, out_root=args.out,
                run_id=args.run_id, gap_policy=args.gap_policy,
                max_dropped=args.max_dropped,
                single_partition=(False if args.multi_partition else None),
                dedup_scan_shards=args.dedup_scan_shards,
                rollup_shards=args.rollup_shards,
                quarantine_dir=args.quarantine,
            )
        else:
            if not (args.input and args.out and args.run_id):
                p.error("tier requires --config or --input/--out/--run-id")
            job = {"input": args.input, "out_root": args.out,
                   "run_id": args.run_id,
                   "gap_policy": args.gap_policy or "locf",
                   "max_dropped": args.max_dropped, "verify_resume": False,
                   "single_partition": False if args.multi_partition else None,
                   "dedup_scan_shards": args.dedup_scan_shards,
                   "rollup_shards": args.rollup_shards,
                   "quarantine_dir": args.quarantine}
        ray = _ray_session(args.num_cpus)
        from mimirsbrunn_ray.pipelines.tiering import run_tiering_job

        paths = sorted(glob.glob(job["input"]))
        summary = run_tiering_job(
            paths, job["out_root"], job["run_id"],
            gap_policy=job["gap_policy"],
            max_dropped=job["max_dropped"],
            verify_resume=job["verify_resume"],
            single_partition=job.get("single_partition"),
            dedup_scan_shards=job.get("dedup_scan_shards"),
            rollup_shards=job.get("rollup_shards"),
            quarantine_dir=job.get("quarantine_dir"),
        )
        print(json.dumps(summary))
        ray.shutdown()
        return 0

    if args.cmd == "serve":
        # serving reads committed parquet via pushdown scans — no Ray
        # session needed (query.py is driver-side metadata + reads)
        from mimirsbrunn_ray.service import serve_forever

        serve_forever(args.root, args.port)
        return 0

    if args.cmd == "merge-late":
        ray = _ray_session(args.num_cpus)
        from mimirsbrunn_ray.pipelines.late import merge_late_data

        paths = sorted(glob.glob(args.input))
        summary = merge_late_data(paths, args.out, args.run_id)
        print(json.dumps(summary))
        ray.shutdown()
        return 0

    if args.cmd == "compact":
        ray = _ray_session(args.num_cpus)
        from mimirsbrunn_ray.state.manifest import read_manifest
        from mimirsbrunn_ray.state.publish import TierStore

        store = TierStore(args.root)
        run_dir = store.compact(
            args.tier, args.run_id, keep_runs=args.keep_runs
        )
        print(json.dumps({"tier": args.tier, "run_dir": run_dir,
                          "segments_before": len(
                              read_manifest(run_dir)["input_paths"])}))
        ray.shutdown()
        return 0

    if args.cmd == "query":
        from mimirsbrunn_ray.query import as_of, lookup_id, status, top_k
        from mimirsbrunn_ray.state.publish import TierStore

        store = TierStore(args.root)
        if args.action == "top-k":
            print(top_k(store, tier=args.tier, k=args.k, source=args.source,
                        debug=args.debug).to_json(orient="records"))
        elif args.action == "lookup":
            row = lookup_id(store, args.doc_id, lang=args.lang)
            print(json.dumps({
                "found": row is not None,
                "doc_id": args.doc_id,
                # localized label is the point of --lang; tokens are
                # elided (payload-sized)
                "label": (row or {}).get("label"),
                "row": {k: v for k, v in (row or {}).items()
                        if k != "tokens"},
            }, default=str))
        elif args.action == "as-of":
            hit = as_of(store, args.source, args.ts_us, tier=args.tier)
            print(json.dumps(hit, default=str))
        else:
            print(json.dumps(status(store), default=str))
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())

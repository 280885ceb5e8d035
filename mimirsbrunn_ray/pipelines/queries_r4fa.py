"""Round-4 batch FA: compressibility, backfill planning, and
boilerplate detection — the Lempel-Ziv-76 phrase complexity of each
type's binarized hourly profile (the classic compressibility /
randomness census, Kaspar-Schuster parse), a backfill chunk planner
(the contiguous missing-hour runs a resumable ingest would submit as
catch-up jobs — the planning face of the gap-fill stage), and the
boilerplate sentence share per source (occurrences of sentences that
appear 2+ times corpus-wide — the paragraph-level dedup signal of
CCNet-style pipelines, computed with ONE sentence-sharded shuffle).

Exactness discipline: LZ76 runs the integer parse on a '0'/'1'
string binarized at the exact lower median (ROW_NUMBER-selected, no
percentile interpolation), replayed by a recursive SQL CTE whose
step finds the minimal new-phrase length; backfill runs are pure
integer gaps-and-islands on the hour grid; sentence counts are
exact int64 and only shares snap ppm."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4dw import (
    _HOUR_US,
    _bucket_counts,
)
from mimirsbrunn_ray.stages.rollup import tree_merge


def _round_half_away(x: float) -> int:
    return int(np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5))


def _lz76(s: str) -> int:
    """Kaspar-Schuster LZ76 phrase count: repeatedly take the
    shortest substring starting at pos that does NOT occur in the
    prefix ending one char before the candidate's end."""
    n = len(s)
    pos = 0  # 0-based
    c = 0
    while pos < n:
        l = 1
        while pos + l <= n and s[pos:pos + l] in s[: pos + l - 1]:
            l += 1
        c += 1
        pos += min(l, n - pos)
    return c


def q_lempel_ziv_complexity(sf_dir):
    """Per event type: LZ76 complexity of the hourly count series
    binarized at its exact lower median — low C = compressible /
    regular traffic, C near n/log2(n) = incompressible. Series
    assembles from the exact distributed count table; the parse is
    a driver-side integer loop on the bounded per-type string."""
    hourly = _bucket_counts(sf_dir, _HOUR_US)
    cols = ["event_type", "n_hours", "n_ones", "lz76"]
    out = {c: [] for c in cols}
    if len(hourly) and "event_type" in hourly.columns:
        for et, g in hourly.sort_values(["event_type", "h"]).groupby(
            "event_type", sort=True
        ):
            c = g["c"].to_numpy(dtype=np.int64)
            n = len(c)
            if n < 2:
                continue
            med = int(np.sort(c)[(n - 1) // 2])  # lower median
            bits = (c > med).astype(np.int8)
            s = "".join("1" if b else "0" for b in bits)
            out["event_type"].append(et)
            out["n_hours"].append(n)
            out["n_ones"].append(int(bits.sum()))
            out["lz76"].append(_lz76(s))
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
        }
    )


LZ76_SQL = """
WITH RECURSIVE hourly AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / 3600000000) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), med AS MATERIALIZED (
  SELECT event_type, c AS m FROM (
    SELECT event_type, c,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c)
             AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM hourly
  ) WHERE rn = (n - 1) // 2 + 1
), strs AS MATERIALIZED (
  SELECT h.event_type,
         STRING_AGG(CASE WHEN h.c > m.m THEN '1' ELSE '0' END, ''
                    ORDER BY h.h) AS s,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN h.c > m.m THEN 1 ELSE 0 END) AS BIGINT)
           AS n_ones
  FROM hourly h JOIN med m ON m.event_type = h.event_type
  GROUP BY 1 HAVING COUNT(*) >= 2
), parse AS (
  SELECT event_type, CAST(1 AS BIGINT) AS pos, CAST(0 AS BIGINT)
    AS c
  FROM strs
  UNION ALL
  SELECT p.event_type,
         p.pos + LEAST(
           COALESCE(
             (SELECT MIN(t.l)
              FROM (SELECT UNNEST(RANGE(1, st.n - p.pos + 2)) AS l)
                t
              WHERE POSITION(SUBSTRING(st.s, p.pos, t.l) IN
                    SUBSTRING(st.s, 1, p.pos + t.l - 2)) = 0),
             st.n - p.pos + 1),
           st.n - p.pos + 1),
         p.c + 1
  FROM parse p JOIN strs st ON st.event_type = p.event_type
  WHERE p.pos <= st.n
)
SELECT s.event_type, s.n AS n_hours, s.n_ones,
       CAST(p.c AS BIGINT) AS lz76
FROM parse p JOIN strs s ON s.event_type = p.event_type
WHERE p.pos = s.n + 1
ORDER BY s.event_type
"""


def q_backfill_chunk_plan(sf_dir):
    """Per event type: the contiguous missing-hour runs between the
    type's first and last observed hour — the exact chunk list a
    resumable backfill would submit (gaps-and-islands on the integer
    hour grid). Emits (run_start_h, run_end_h, n_missing), ordered."""
    hourly = _bucket_counts(sf_dir, _HOUR_US)
    cols = ["event_type", "run_start_h", "run_end_h", "n_missing"]
    out = {c: [] for c in cols}
    if len(hourly) and "event_type" in hourly.columns:
        for et, g in hourly.sort_values(["event_type", "h"]).groupby(
            "event_type", sort=True
        ):
            h = g["h"].to_numpy(dtype=np.int64)
            lo, hi = int(h.min()), int(h.max())
            grid = np.arange(lo, hi + 1, dtype=np.int64)
            present = np.zeros(hi - lo + 1, bool)
            present[h - lo] = True
            miss = grid[~present]
            if len(miss) == 0:
                continue
            brk = np.concatenate(
                ([True], np.diff(miss) > 1)
            )
            run_id = np.cumsum(brk)
            for r in np.unique(run_id):
                seg = miss[run_id == r]
                out["event_type"].append(et)
                out["run_start_h"].append(int(seg[0]))
                out["run_end_h"].append(int(seg[-1]))
                out["n_missing"].append(len(seg))
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
        }
    )


BACKFILL_SQL = """
WITH hourly AS MATERIALIZED (
  SELECT DISTINCT event_type,
         CAST(FLOOR(EPOCH_US(ts) / 3600000000) AS BIGINT) AS h
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
), spans AS MATERIALIZED (
  SELECT event_type, MIN(h) AS lo, MAX(h) AS hi
  FROM hourly GROUP BY 1
), grid AS MATERIALIZED (
  SELECT s.event_type, g.h
  FROM spans s, LATERAL (
    SELECT UNNEST(RANGE(s.lo, s.hi + 1)) AS h
  ) g
), missing AS MATERIALIZED (
  SELECT g.event_type, g.h,
         g.h - ROW_NUMBER() OVER (PARTITION BY g.event_type
                                  ORDER BY g.h) AS grp
  FROM grid g
  LEFT JOIN hourly o
    ON o.event_type = g.event_type AND o.h = g.h
  WHERE o.h IS NULL
)
SELECT event_type,
       CAST(MIN(h) AS BIGINT) AS run_start_h,
       CAST(MAX(h) AS BIGINT) AS run_end_h,
       CAST(COUNT(*) AS BIGINT) AS n_missing
FROM missing
GROUP BY event_type, grp
ORDER BY event_type, run_start_h
"""


def q_boilerplate_sentence_share(sf_dir):
    """Per source: the share of sentence OCCURRENCES whose sentence
    text appears 2+ times corpus-wide (cross-source). Sentences =
    non-empty trimmed '.'-splits. One (sentence)-sharded shuffle:
    because shards are sentence-disjoint, each shard computes both
    the global per-sentence total and the per-(source) occurrence
    split locally — no second pass, no driver vocabulary."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b["source"]),
                    pc.is_valid(b["text"]))
        b = b.filter(m)
        sent = pc.split_pattern(b["text"], pattern=".")
        lens = pc.list_value_length(sent).to_numpy(
            zero_copy_only=False
        )
        src = np.repeat(
            b["source"].to_numpy(zero_copy_only=False), lens
        )
        flat = pc.utf8_trim_whitespace(pc.list_flatten(sent))
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "src": pa.array(src[keep], pa.string()),
                "sent": flat.filter(pa.array(keep)),
                "c": pa.array(
                    np.ones(int(keep.sum()), np.int64)
                ),
            }
        )
        g = t.group_by(["src", "sent"]).aggregate([("c", "sum")])
        return g.rename_columns(["src", "sent", "c"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["src", "sent"]).aggregate([("c", "sum")])
        return g.rename_columns(["src", "sent", "c"])

    counts = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow",
                         batch_size=None),
        combine,
        final_shards=8,
        shard_cols=["sent"],  # sentence-disjoint shards
    )

    def per_shard(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sent" not in b.column_names:
            return pa.table(
                {"source": pa.array([], pa.string()),
                 "n_occ": pa.array([], pa.int64()),
                 "dup_occ": pa.array([], pa.int64())}
            )
        df = b.select(["src", "sent", "c"]).to_pandas()
        tot = df.groupby("sent")["c"].transform("sum")
        df["dup"] = np.where(tot >= 2, df["c"], 0)
        g = df.groupby("src", sort=False).agg(
            n_occ=("c", "sum"), dup_occ=("dup", "sum")
        ).reset_index()
        return pa.table(
            {
                "source": pa.array(g["src"], pa.string()),
                "n_occ": pa.array(
                    g["n_occ"].to_numpy(dtype=np.int64)
                ),
                "dup_occ": pa.array(
                    g["dup_occ"].to_numpy(dtype=np.int64)
                ),
            }
        )

    def fold(b: pa.Table) -> pa.Table:
        g = b.group_by(["source"]).aggregate(
            [("n_occ", "sum"), ("dup_occ", "sum")]
        )
        return g.rename_columns(["source", "n_occ", "dup_occ"])

    out = tree_merge(
        counts.map_batches(per_shard, batch_format="pyarrow",
                           batch_size=None),
        fold,
    ).to_pandas()
    from mimirsbrunn_ray.stages.broadcast import ensure_cols

    out = ensure_cols(out, ["source", "n_occ", "dup_occ"])
    out = out.sort_values("source", ignore_index=True)
    ppm = np.array(
        [
            _round_half_away(float(d) / float(n) * 1e6) if n else 0
            for d, n in zip(out["dup_occ"], out["n_occ"])
        ],
        np.int64,
    )
    return pa.table(
        {
            "source": pa.array(out["source"], pa.string()),
            "n_occ": pa.array(out["n_occ"].to_numpy(dtype=np.int64)),
            "dup_occ": pa.array(
                out["dup_occ"].to_numpy(dtype=np.int64)
            ),
            "dup_ppm": pa.array(ppm),
        }
    )


BOILERPLATE_SQL = """
WITH s AS MATERIALIZED (
  SELECT source,
         TRIM(UNNEST(string_split(text, '.'))) AS sent
  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL
), occ AS MATERIALIZED (
  SELECT source, sent FROM s WHERE sent <> ''
), tot AS MATERIALIZED (
  SELECT sent, CAST(COUNT(*) AS BIGINT) AS g
  FROM occ GROUP BY 1
), per AS MATERIALIZED (
  SELECT o.source,
         CASE WHEN t.g >= 2 THEN 1 ELSE 0 END AS is_dup
  FROM occ o JOIN tot t ON t.sent = o.sent
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_occ,
       CAST(SUM(is_dup) AS BIGINT) AS dup_occ,
       CAST(ROUND(CAST(SUM(is_dup) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE) * 1000000, 0) AS BIGINT)
         AS dup_ppm
FROM per GROUP BY source ORDER BY source
"""


def register_r4fa(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "lempel_ziv_complexity": q_lempel_ziv_complexity,
            "backfill_chunk_plan": q_backfill_chunk_plan,
            "boilerplate_sentence_share":
                q_boilerplate_sentence_share,
        }
    )
    oracles.update(
        {
            "lempel_ziv_complexity": LZ76_SQL,
            "backfill_chunk_plan": BACKFILL_SQL,
            "boilerplate_sentence_share": BOILERPLATE_SQL,
        }
    )

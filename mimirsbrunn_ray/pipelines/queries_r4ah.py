"""Round-4 batch AH: diversified top-k retrieval (per-group quota),
tail-hour attribution above the p99, and Lorenz-curve deciles of user
value concentration.

Exactness discipline: ranks, quotas, counts, decile boundaries
(ceil(d*n/10) as (d*n+9)//10) and cents sums are all integers; tie
groups straddling a decile boundary contribute identically under any
tie order because tied users carry equal values.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_HOUR_US = 3_600_000_000


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# diversified top-k: global top 10 docs with a 2-per-language quota
# ---------------------------------------------------------------------------

_DIV_QUOTA = 2
_DIV_K = 10


def q_diversified_topk_docs(sf_dir):
    """Diversified retrieval: the global top `_DIV_K` documents by
    importance (n_chars, doc_id tiebreak) under a `_DIV_QUOTA`-per-
    language cap — the search-layer diversity constraint that stops one
    dominant language from filling the page. One grouped_top_k pass
    (per-batch partial prune + one group-key shuffle) bounds the
    candidate set to quota x languages; the global cut is a bytes-sized
    driver finish."""
    from mimirsbrunn_ray.stages.search import grouped_top_k

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    ).filter(lambda r: r["lang"] is not None and r["n_chars"] is not None)
    per_lang = grouped_top_k(
        docs, ["lang"], "n_chars", _DIV_QUOTA,
        descending=True, tiebreak_cols=("doc_id",),
    ).to_pandas()  # bounded: quota x languages
    from mimirsbrunn_ray.stages.broadcast import ensure_cols

    per_lang = ensure_cols(per_lang, ["doc_id", "lang", "n_chars"])
    per_lang = per_lang.sort_values(
        ["n_chars", "doc_id"], ascending=[False, True], ignore_index=True
    ).head(_DIV_K)
    return pa.table(
        {
            "doc_id": pa.array(
                per_lang["doc_id"].to_numpy(dtype=np.int64)
            ),
            "lang": pa.array(per_lang["lang"], pa.string()),
            "n_chars": pa.array(
                per_lang["n_chars"].to_numpy(dtype=np.int64)
            ),
        }
    )


DIVERSIFIED_SQL = f"""
WITH ranked AS (
  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents
  WHERE lang IS NOT NULL AND n_chars IS NOT NULL
)
SELECT doc_id, lang, n_chars
FROM ranked WHERE rk <= {_DIV_QUOTA}
ORDER BY n_chars DESC, doc_id
LIMIT {_DIV_K}
"""


# ---------------------------------------------------------------------------
# tail attribution: which hours carry each type's above-p99 events
# ---------------------------------------------------------------------------

_TAIL_Q = 0.99
_TAIL_TOPH = 3


def q_tail_hours_per_type(sf_dir):
    """Per event type, the `_TAIL_TOPH` hours contributing the most
    STRICTLY-above-p99 values — tail attribution ('when do our extreme
    events happen'). Pass 1: the decomposable (type, cents) histogram
    gives the exact PERCENTILE_DISC p99; pass 2 counts above-threshold
    events per (type, hour) (bounded by types x hours) and a grouped
    rank keeps the top hours. No sort shuffle."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def hist_partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["event_type"]), pc.is_valid(b["value"]))
        )
        x = _round_half_away(
            b["value"].cast(pa.float64()).to_numpy(zero_copy_only=False)
            * 100.0
        )
        t = pa.table({"event_type": b["event_type"], "v": pa.array(x)})
        g = t.group_by(["event_type", "v"]).aggregate([([], "count_all")])
        g = g.select(["event_type", "v", "count_all"])
        return g.rename_columns(["event_type", "v", "n"])

    def hist_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "v"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "v", "n"])

    hist = tree_merge(
        ev.map_batches(hist_partial, batch_format="pyarrow",
                       batch_size=None),
        hist_combine,
    ).to_pandas()

    p99: dict[str, int] = {}
    if len(hist):
        for et, g in hist.groupby("event_type"):
            g = g.sort_values("v")
            v = g["v"].to_numpy(dtype=np.int64)
            cum = np.cumsum(g["n"].to_numpy(dtype=np.int64))
            rank = int(np.ceil(_TAIL_Q * int(cum[-1]) - 1e-9))
            p99[et] = int(v[np.searchsorted(cum, rank, "left")])
    import ray

    p99_ref = ray.put(p99)

    def tail_partial(b: pa.Table) -> pa.Table:
        th = ray.get(p99_ref)
        b = b.filter(
            pc.and_(
                pc.and_(
                    pc.is_valid(b["event_type"]), pc.is_valid(b["value"])
                ),
                pc.is_valid(b["ts"]),
            )
        )
        empty = pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "hr": pa.array([], pa.int64()),
                "n_tail": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        et = b["event_type"].to_numpy(zero_copy_only=False)
        x = _round_half_away(
            b["value"].cast(pa.float64()).to_numpy(zero_copy_only=False)
            * 100.0
        )
        thr = np.empty(len(x), dtype=np.int64)
        for s in pd.unique(et):  # bounded by type cardinality
            thr[et == s] = th[s]
        keep = x > thr
        if not keep.any():
            return empty
        ts_us = (
            b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)[keep]
        )
        t = pa.table(
            {
                "event_type": b["event_type"].filter(pa.array(keep)),
                "hr": pa.array(np.floor_divide(ts_us, _HOUR_US)),
            }
        )
        g = t.group_by(["event_type", "hr"]).aggregate([([], "count_all")])
        g = g.select(["event_type", "hr", "count_all"])
        return g.rename_columns(["event_type", "hr", "n_tail"])

    def tail_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "hr"]).aggregate([("n_tail", "sum")])
        return g.rename_columns(["event_type", "hr", "n_tail"])

    hourly = tree_merge(
        ev.map_batches(tail_partial, batch_format="pyarrow",
                       batch_size=None),
        tail_combine,
    ).to_pandas()  # bounded: types x hours

    rows = {"event_type": [], "hr": [], "n_tail": [], "p99_x100": []}
    if len(hourly):
        for et, g in hourly.groupby("event_type", sort=True):
            g = g.sort_values(
                ["n_tail", "hr"], ascending=[False, True]
            ).head(_TAIL_TOPH)
            rows["event_type"].extend([et] * len(g))
            rows["hr"].extend(g["hr"].astype(np.int64).tolist())
            rows["n_tail"].extend(g["n_tail"].astype(np.int64).tolist())
            rows["p99_x100"].extend([p99[et]] * len(g))
    return pa.table(
        {
            "event_type": pa.array(rows["event_type"], pa.string()),
            "hr": pa.array(rows["hr"], pa.int64()),
            "n_tail": pa.array(rows["n_tail"], pa.int64()),
            "p99_x100": pa.array(rows["p99_x100"], pa.int64()),
        }
    )


TAIL_HOURS_SQL = f"""
WITH v AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hr,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL AND ts IS NOT NULL
), q AS (
  SELECT event_type, CAST(quantile_disc(x, {_TAIL_Q}) AS BIGINT) AS p99
  FROM v GROUP BY 1
), tail AS (
  SELECT v.event_type, v.hr, q.p99,
         CAST(COUNT(*) AS BIGINT) AS n_tail
  FROM v JOIN q USING (event_type)
  WHERE v.x > q.p99
  GROUP BY 1, 2, 3
)
SELECT event_type, hr, n_tail, p99 AS p99_x100
FROM tail
QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
                           ORDER BY n_tail DESC, hr) <= {_TAIL_TOPH}
"""


# ---------------------------------------------------------------------------
# Lorenz-curve deciles: cumulative value share by user decile
# ---------------------------------------------------------------------------


def q_lorenz_deciles_per_type(sf_dir):
    """Per event type, the Lorenz curve of value concentration at
    decile resolution: users sorted by their total value ascending,
    decile d's boundary at ceil(d*n/10) users, emitting exact
    (cum_users, cum_value_x100) at every boundary — the curve behind
    user_activity_gini's scalar. One user hash-bucket shuffle gives
    exact per-user cents totals; the per-type VALUE histogram of those
    totals (bounded by distinct total levels) drives the driver's
    boundary walk, with straddling tie groups split by count (value-
    invariant under tie order)."""
    from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "value"],
    )

    def project(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(
                    pc.is_valid(b["user_id"]), pc.is_valid(b["event_type"])
                ),
                pc.is_valid(b["value"]),
            )
        )
        x = _round_half_away(
            b["value"].cast(pa.float64()).to_numpy(zero_copy_only=False)
            * 100.0
        )
        t = pa.table(
            {
                "user_id": b["user_id"],
                "event_type": b["event_type"],
                "x": pa.array(x),
            }
        )
        return add_bucket(t, "user_id", 64)

    proj = ev.map_batches(project, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "v": pd.Series([], dtype=np.int64),
                "c": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        uv = g.groupby(["event_type", "user_id"], sort=False)["x"].sum()
        hist = (
            uv.groupby([uv.index.get_level_values(0), uv.values])
            .size()
            .reset_index()
        )
        hist.columns = ["event_type", "v", "c"]
        hist["v"] = hist["v"].astype(np.int64)
        hist["c"] = hist["c"].astype(np.int64)
        return hist

    partials = proj.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "v"]).aggregate([("c", "sum")])
        return g.rename_columns(["event_type", "v", "c"])

    hist = tree_merge(partials, combine).to_pandas()
    # bounded: types x distinct per-user total levels

    rows = {"event_type": [], "decile": [], "cum_users": [],
            "cum_value_x100": []}
    if len(hist):
        for et, g in hist.groupby("event_type", sort=True):
            g = g.sort_values("v")
            v = g["v"].to_numpy(dtype=np.int64)
            c = g["c"].to_numpy(dtype=np.int64)
            cum_c = np.cumsum(c)
            cum_v = np.cumsum(c * v)
            n = int(cum_c[-1])
            for d in range(1, 11):
                b_d = (d * n + 9) // 10  # ceil(d*n/10)
                # full tie groups below the boundary + a split group
                i = int(np.searchsorted(cum_c, b_d, "left"))
                below_c = int(cum_c[i - 1]) if i > 0 else 0
                below_v = int(cum_v[i - 1]) if i > 0 else 0
                extra = b_d - below_c
                val = below_v + extra * int(v[i]) if i < len(v) else below_v
                rows["event_type"].append(et)
                rows["decile"].append(d)
                rows["cum_users"].append(b_d)
                rows["cum_value_x100"].append(val)
    return pa.table(
        {
            "event_type": pa.array(rows["event_type"], pa.string()),
            "decile": pa.array(rows["decile"], pa.int64()),
            "cum_users": pa.array(rows["cum_users"], pa.int64()),
            "cum_value_x100": pa.array(rows["cum_value_x100"], pa.int64()),
        }
    )


LORENZ_SQL = """
WITH uv AS (
  SELECT event_type, user_id,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    AND value IS NOT NULL
  GROUP BY 1, 2
), r AS (
  SELECT event_type, v,
         CAST(ROW_NUMBER()
              OVER (PARTITION BY event_type ORDER BY v, user_id)
              AS BIGINT) AS i,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
         CAST(SUM(v) OVER (PARTITION BY event_type ORDER BY v, user_id)
              AS BIGINT) AS cum_v
  FROM uv
), d(decile) AS (
  SELECT unnest(generate_series(1, 10))
)
SELECT r.event_type, CAST(d.decile AS BIGINT) AS decile,
       CAST((d.decile * r.n + 9) // 10 AS BIGINT) AS cum_users,
       MAX(CASE WHEN r.i = (d.decile * r.n + 9) // 10
                THEN r.cum_v END) AS cum_value_x100
FROM r JOIN d ON r.i = (d.decile * r.n + 9) // 10
GROUP BY 1, 2, 3
"""


def register_r4ah(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "diversified_topk_docs": q_diversified_topk_docs,
            "tail_hours_per_type": q_tail_hours_per_type,
            "lorenz_deciles_per_type": q_lorenz_deciles_per_type,
        }
    )
    oracles.update(
        {
            "diversified_topk_docs": DIVERSIFIED_SQL,
            "tail_hours_per_type": TAIL_HOURS_SQL,
            "lorenz_deciles_per_type": LORENZ_SQL,
        }
    )

"""Round-4 batch BN: priority escalation share over time, doc
length-vs-vocab slope sign per source, and hourly order arrival
dispersion.

Exactness discipline: escalation shares ship as integer count pairs;
slope signs are sign(n*Sxy - Sx*Sy) over exact integers; dispersion
ships as the integer (n, sum, sumsq) triple over hourly order counts.
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
# urgent-priority share per month
# ---------------------------------------------------------------------------


def q_priority_share_monthly(sf_dir):
    """Per order month: total orders and how many carried an urgent
    priority ('1-URGENT' or '2-HIGH') — the escalation-mix trend an
    operations lead watches (a rising urgent share means SLAs are being
    gamed or demand is shifting). One decomposable pass, bounded by
    months."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderdate", "o_orderpriority"],
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.is_valid(b["o_orderdate"]),
                pc.is_valid(b["o_orderpriority"]),
            )
        )
        dt = b["o_orderdate"].cast(pa.timestamp("us"))
        yr = pc.year(dt).to_numpy(zero_copy_only=False).astype(np.int64)
        mo = pc.month(dt).to_numpy(zero_copy_only=False).astype(np.int64)
        pr = b["o_orderpriority"].to_numpy(zero_copy_only=False)
        urgent = (
            np.char.startswith(pr.astype(str), "1-")
            | np.char.startswith(pr.astype(str), "2-")
        ).astype(np.int64)
        t = pa.table(
            {
                "month_idx": pa.array(yr * 12 + mo - 1),
                "one": pa.array(np.ones(len(pr), np.int64)),
                "u": pa.array(urgent),
            }
        )
        g = t.group_by(["month_idx"]).aggregate(
            [("one", "sum"), ("u", "sum")]
        )
        g = g.select(["month_idx", "one_sum", "u_sum"])
        return g.rename_columns(["month_idx", "n_orders", "n_urgent"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["month_idx"]).aggregate(
            [("n_orders", "sum"), ("n_urgent", "sum")]
        )
        return g.rename_columns(["month_idx", "n_orders", "n_urgent"])

    return tree_merge(
        orders.map_batches(partial, batch_format="pyarrow",
                           batch_size=None),
        combine,
    )


PRIORITY_SHARE_SQL = """
SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
         AS month_idx,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN o_orderpriority LIKE '1-%'
                       OR o_orderpriority LIKE '2-%'
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent
FROM orders
WHERE o_orderdate IS NOT NULL AND o_orderpriority IS NOT NULL
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# length-vs-vocabulary slope sign per source
# ---------------------------------------------------------------------------


def q_length_vocab_slope_sign(sf_dir):
    """Per source: the EXACT sign of the OLS slope between document
    length (words) and distinct-word count — positive everywhere in
    healthy text (more words, more vocabulary); a zero/negative sign
    flags TEMPLATED sources whose extra length is repetition.
    sign(n*Sxy - Sx*Sy) over exact integers; one streaming metric pass
    plus a bounded per-source fold."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["source"]), pc.is_valid(b["text"]))
        )
        empty = pa.table(
            {
                "source": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "sx": pa.array([], pa.int64()),
                "sy": pa.array([], pa.int64()),
                "sxy": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        words = pc.split_pattern(pc.utf8_lower(b["text"]), " ")
        n_per = pc.list_value_length(words).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        flat = pc.list_flatten(words).to_numpy(zero_copy_only=False)
        seg = np.repeat(np.arange(len(b)), n_per)
        uq = (
            pd.DataFrame({"seg": seg, "w": flat})
            .drop_duplicates()
            .groupby("seg", sort=False)
            .size()
        )
        u = np.zeros(len(b), dtype=np.int64)
        u[uq.index.to_numpy()] = uq.to_numpy(dtype=np.int64)
        t = pa.table(
            {
                "source": b["source"],
                "one": pa.array(np.ones(len(b), np.int64)),
                "x": pa.array(n_per),
                "y": pa.array(u),
                "xy": pa.array(n_per * u),
            }
        )
        g = t.group_by(["source"]).aggregate(
            [("one", "sum"), ("x", "sum"), ("y", "sum"), ("xy", "sum")]
        )
        g = g.select(["source", "one_sum", "x_sum", "y_sum", "xy_sum"])
        return g.rename_columns(["source", "n", "sx", "sy", "sxy"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["source"]).aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"), ("sxy", "sum")]
        )
        return g.rename_columns(["source", "n", "sx", "sy", "sxy"])

    m = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow",
                         batch_size=None),
        combine,
    ).to_pandas()
    from mimirsbrunn_ray.stages.broadcast import ensure_cols

    m = ensure_cols(m, ["source", "n", "sx", "sy", "sxy"]).sort_values(
        "source", ignore_index=True)

    if not len(m):
        return pa.table(
            {
                "source": pa.array([], pa.string()),
                "n_docs": pa.array([], pa.int64()),
                "slope_sign": pa.array([], pa.int64()),
            }
        )
    sgn = np.sign(
        m["n"].to_numpy(dtype=np.int64) * m["sxy"].to_numpy(dtype=np.int64)
        - m["sx"].to_numpy(dtype=np.int64)
        * m["sy"].to_numpy(dtype=np.int64)
    ).astype(np.int64)
    return pa.table(
        {
            "source": pa.array(m["source"], pa.string()),
            "n_docs": pa.array(m["n"].to_numpy(dtype=np.int64)),
            "slope_sign": pa.array(sgn),
        }
    )


SLOPE_SIGN_SQL = """
WITH d AS (
  SELECT source,
         CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS x,
         CAST(len(list_distinct(string_split(lower(text), ' ')))
              AS BIGINT) AS y
  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL
), m AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM d GROUP BY 1
)
SELECT source, n AS n_docs,
       CAST(SIGN(n * sxy - sx * sy) AS BIGINT) AS slope_sign
FROM m
"""


# ---------------------------------------------------------------------------
# hourly order-arrival dispersion
# ---------------------------------------------------------------------------


def q_order_arrival_dispersion(sf_dir):
    """The dispersion triple (n, sum, sumsq) of HOURLY ORDER COUNTS —
    variance/mean over the emitted integers is the index of dispersion
    that separates Poisson-like arrivals (~1) from batched/bursty
    submission (>1). Orders timestamps are date-grain, so the 'hour'
    here is the calendar day scaled — counts per order DAY (the
    arrival grain the table actually has). One bounded pass."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["o_orderdate"]))
        ts_us = (
            b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        day = ts_us // 86_400_000_000
        t = pa.table({"day": pa.array(day)})
        g = t.group_by(["day"]).aggregate([([], "count_all")])
        g = g.select(["day", "count_all"])
        return g.rename_columns(["day", "n"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["day"]).aggregate([("n", "sum")])
        return g.rename_columns(["day", "n"])

    daily = tree_merge(
        orders.map_batches(partial, batch_format="pyarrow",
                           batch_size=None),
        combine,
    ).to_pandas()

    if not len(daily):
        return pa.table(
            {
                "n_days": pa.array([0], pa.int64()),
                "sum_orders": pa.array([0], pa.int64()),
                "sumsq_orders": pa.array([0], pa.int64()),
            }
        )
    c = daily["n"].to_numpy(dtype=np.int64)
    return pa.table(
        {
            "n_days": pa.array([len(c)], pa.int64()),
            "sum_orders": pa.array([int(c.sum())], pa.int64()),
            "sumsq_orders": pa.array([int(np.dot(c, c))], pa.int64()),
        }
    )


DISPERSION_SQL = """
WITH d AS (
  SELECT CAST(FLOOR(epoch(o_orderdate) / 86400) AS BIGINT) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders WHERE o_orderdate IS NOT NULL
  GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(n) AS BIGINT) AS sum_orders,
       CAST(SUM(n * n) AS BIGINT) AS sumsq_orders
FROM d
"""


def register_r4bn(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "priority_share_monthly": q_priority_share_monthly,
            "length_vocab_slope_sign": q_length_vocab_slope_sign,
            "order_arrival_dispersion": q_order_arrival_dispersion,
        }
    )
    oracles.update(
        {
            "priority_share_monthly": PRIORITY_SHARE_SQL,
            "length_vocab_slope_sign": SLOPE_SIGN_SQL,
            "order_arrival_dispersion": DISPERSION_SQL,
        }
    )

"""Round-4 batch FF: relational DIVISION (the one classic relational
operator the registry lacked): per-supplier coverage of the globally
observed (customer-nation x order-priority) combo set over
returned-item shipments, with the exact division flag (covers ALL
combos); the STATIONARY distribution of the event-type Markov chain
(16-step integer ppm power iteration, the long-run mix the
transition-matrix queries imply — unrolled CTE chain, the r4er
markov discipline); and Shannon code lengths per event type
(ceil(log2(1/p)) bits — the integer entropy-coding cost model next
to the dict/varint audits).

Exactness discipline: division coverage counts dedup through a
key-disjoint sharded combine and compare as exact ints; the Markov
iteration is floor-ppm arithmetic replayed term-for-term in SQL
(mass may leak to floors — identical on both sides by
construction); code lengths apply CEIL to the identical double
log2(total/c) from exact ints."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from mimirsbrunn_ray.stages.broadcast import safe_join as _safe_join

from mimirsbrunn_ray.context import pool_size
from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge

_MK_STEPS = 16


def _round_half_away(x: float) -> int:
    return int(np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5))


def q_relational_division_suppliers(sf_dir):
    """Division with a coverage census: distinct (suppkey, nation,
    priority) triples over returnflag='R' lines (two big-big
    orderkey/custkey joins, combiner-first distinct before each),
    folded through a key-disjoint sharded dedup; each supplier
    reports covered combos, the global divisor size, and the exact
    division flag covered == |divisor|."""
    n_part = max(8, pool_size())

    def li_project(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["l_returnflag"], "R"))
        g = b.group_by(["l_orderkey", "l_suppkey"]).aggregate(
            [([], "count_all")]
        )
        return g.select(["l_orderkey", "l_suppkey"])

    li = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_returnflag"],
        )
        .map_batches(li_project, batch_format="pyarrow",
                     batch_size=None)
        .repartition(n_part)
    )

    orders = (
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderpriority"],
        )
        .repartition(n_part)
    )
    cust = (
        rd.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_nationkey"],
        )
        .repartition(n_part)
    )

    j1 = _safe_join(
        li, orders,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        join_type="inner",
        num_partitions=n_part,
    ).repartition(n_part)
    j2 = _safe_join(
        j1, cust,
        on=("o_custkey",),
        right_on=("c_custkey",),
        join_type="inner",
        num_partitions=n_part,
    )

    def triple_dedup(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "l_suppkey" not in b.column_names:
            return pa.table(
                {"s": pa.array([], pa.int64()),
                 "nk": pa.array([], pa.int64()),
                 "pr": pa.array([], pa.string())}
            )
        t = pa.table(
            {
                "s": b["l_suppkey"].cast(pa.int64()),
                "nk": b["c_nationkey"].cast(pa.int64()),
                "pr": b["o_orderpriority"],
            }
        )
        g = t.group_by(["s", "nk", "pr"]).aggregate(
            [([], "count_all")]
        )
        return g.select(["s", "nk", "pr"])

    def triple_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["s", "nk", "pr"]).aggregate(
            [([], "count_all")]
        )
        return g.select(["s", "nk", "pr"])

    triples = tree_merge(
        j2.map_batches(triple_dedup, batch_format="pyarrow",
                       batch_size=None),
        triple_combine,
        final_shards=8,
        shard_cols=["s", "nk", "pr"],
    ).to_pandas()
    if len(triples) == 0:
        return pa.table(
            {
                "s_suppkey": pa.array([], pa.int64()),
                "covered": pa.array([], pa.int64()),
                "divisor_size": pa.array([], pa.int64()),
                "is_divisor": pa.array([], pa.int64()),
            }
        )
    divisor = len(
        triples[["nk", "pr"]].drop_duplicates()
    )
    per = (
        triples.groupby("s", sort=True)
        .size()
        .reset_index(name="covered")
    )
    return pa.table(
        {
            "s_suppkey": pa.array(
                per["s"].to_numpy(dtype=np.int64)
            ),
            "covered": pa.array(
                per["covered"].to_numpy(dtype=np.int64)
            ),
            "divisor_size": pa.array(
                np.full(len(per), divisor, np.int64)
            ),
            "is_divisor": pa.array(
                (per["covered"].to_numpy(dtype=np.int64)
                 == divisor).astype(np.int64)
            ),
        }
    )


DIVISION_SQL = """
WITH pairs AS MATERIALIZED (
  SELECT DISTINCT l_suppkey AS s,
         CAST(c_nationkey AS BIGINT) AS nk,
         o_orderpriority AS pr
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE l_returnflag = 'R'
), divisor AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS t
  FROM (SELECT DISTINCT nk, pr FROM pairs)
)
SELECT s AS s_suppkey,
       CAST(COUNT(*) AS BIGINT) AS covered,
       d.t AS divisor_size,
       CASE WHEN COUNT(*) = d.t THEN 1 ELSE 0 END AS is_divisor
FROM pairs, divisor d
GROUP BY s, d.t ORDER BY s
"""


def _transition_matrix(sf_dir) -> pd.DataFrame:
    """(f, t, c) consecutive same-user transition counts, ordered by
    (ts, event_id) — one user-hash shuffle."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def project(b: pa.Table) -> pa.Table:
        m = None
        for c in ("user_id", "ts", "event_type"):
            v = pc.is_valid(b[c])
            m = v if m is None else pc.and_(m, v)
        b = b.filter(m)
        t = pa.table(
            {
                "user_id": b["user_id"],
                "us": b["ts"].cast(pa.timestamp("us")).cast(
                    pa.int64()
                ),
                "event_id": b["event_id"],
                "event_type": b["event_type"],
            }
        )
        return add_bucket(t, "user_id", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"f": pd.Series([], dtype=object),
                 "t": pd.Series([], dtype=object),
                 "c": pd.Series([], dtype=np.int64)}
            )
        g = g.sort_values(["user_id", "us", "event_id"],
                          kind="mergesort", ignore_index=True)
        uid = g["user_id"].to_numpy(dtype=np.int64)
        et = g["event_type"].to_numpy()
        same = uid[1:] == uid[:-1]
        df = pd.DataFrame(
            {"f": et[:-1][same], "t": et[1:][same]}
        )
        out = df.groupby(["f", "t"], sort=False).size().reset_index(
            name="c"
        )
        out["c"] = out["c"].astype(np.int64)
        return out

    parts = (
        ev.map_batches(project, batch_format="pyarrow",
                       batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if len(parts) == 0:
        return parts
    return (
        parts.groupby(["f", "t"], sort=True)["c"].sum().reset_index()
    )


def q_markov_stationary_distribution(sf_dir):
    """The long-run event-type mix: 16 floor-ppm power-iteration
    steps of pi' = pi P with P_ij = c_ij*1e6 // rowsum_i, pi_0
    uniform (1e6 // k each). Every mass transfer floors, so both
    sides see identical int64 states; leaked floor mass stays
    leaked by construction."""
    tm = _transition_matrix(sf_dir)
    if len(tm) == 0:
        return pa.table(
            {"event_type": pa.array([], pa.string()),
             "pi_ppm": pa.array([], pa.int64())}
        )
    states = sorted(set(tm["f"]) | set(tm["t"]))
    idx = {s: i for i, s in enumerate(states)}
    k = len(states)
    rs = tm.groupby("f")["c"].sum().to_dict()
    p = np.zeros((k, k), np.int64)
    for f, t, c in tm.itertuples(index=False):
        p[idx[f], idx[t]] = int(c) * 1_000_000 // int(rs[f])
    pi = np.full(k, 1_000_000 // k, dtype=np.int64)
    for _ in range(_MK_STEPS):
        pi = np.array(
            [
                int(np.sum((pi * p[:, j]) // 1_000_000))
                for j in range(k)
            ],
            np.int64,
        )
    return pa.table(
        {
            "event_type": pa.array(states, pa.string()),
            "pi_ppm": pa.array(pi),
        }
    )


def _markov_sql() -> str:
    head = """
WITH e AS MATERIALIZED (
  SELECT user_id, EPOCH_US(ts) AS us, event_id, event_type
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL
), seq AS MATERIALIZED (
  SELECT event_type AS f,
         LEAD(event_type) OVER w AS t,
         CASE WHEN LEAD(user_id) OVER w = user_id THEN 1 ELSE 0 END
           AS same
  FROM e WINDOW w AS (ORDER BY user_id, us, event_id)
), tm AS MATERIALIZED (
  SELECT f, t, CAST(COUNT(*) AS BIGINT) AS c
  FROM seq WHERE same = 1 AND t IS NOT NULL GROUP BY 1, 2
), states AS MATERIALIZED (
  SELECT DISTINCT st FROM (
    SELECT f AS st FROM tm UNION SELECT t FROM tm
  )
), k AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS k FROM states
), pmat AS MATERIALIZED (
  SELECT tm.f, tm.t, tm.c * 1000000 // rs.rsum AS p
  FROM tm JOIN (SELECT f, SUM(c) AS rsum FROM tm GROUP BY 1) rs
    ON rs.f = tm.f
), s0 AS MATERIALIZED (
  SELECT st, CAST(1000000 // k.k AS BIGINT) AS pi
  FROM states, k
)"""
    steps = []
    for i in range(1, _MK_STEPS + 1):
        steps.append(
            f""", s{i} AS MATERIALIZED (
  SELECT states.st,
         CAST(COALESCE(SUM((s.pi * m.p) // 1000000), 0) AS BIGINT)
           AS pi
  FROM states
  LEFT JOIN pmat m ON m.t = states.st
  LEFT JOIN s{i - 1} s ON s.st = m.f
  GROUP BY 1
)"""
        )
    tail = f"""
SELECT st AS event_type, pi AS pi_ppm
FROM s{_MK_STEPS} ORDER BY st
"""
    return head + "".join(steps) + tail


MARKOV_STATIONARY_SQL = _markov_sql()


def q_shannon_code_length(sf_dir):
    """Per event type: the Shannon code length ceil(log2(total/c))
    bits and the type's share — the entropy-coding cost model for
    a dictionary-coded type column (companion to
    dict_encoding_benefit)."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["event_type"]))
        g = b.group_by(["event_type"]).aggregate([([], "count_all")])
        return g.select(["event_type", "count_all"]).rename_columns(
            ["event_type", "c"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate([("c", "sum")])
        return g.rename_columns(["event_type", "c"])

    per = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow",
                       batch_size=None),
        combine,
    ).to_pandas()
    from mimirsbrunn_ray.stages.broadcast import ensure_cols

    per = ensure_cols(per, ["event_type", "c"]).sort_values(
        "event_type", ignore_index=True)
    total = int(per["c"].sum()) if len(per) else 0
    bits = [
        int(np.ceil(np.log2(total / float(c)))) if c else None
        for c in per["c"]
    ]
    share = [
        _round_half_away(float(c) / total * 1e6) if total else 0
        for c in per["c"]
    ]
    return pa.table(
        {
            "event_type": pa.array(per["event_type"], pa.string()),
            "n": pa.array(per["c"].to_numpy(dtype=np.int64)),
            "share_ppm": pa.array(share, pa.int64()),
            "code_len_bits": pa.array(bits, pa.int64()),
        }
    )


SHANNON_SQL = """
WITH per AS MATERIALIZED (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE event_type IS NOT NULL GROUP BY 1
), tot AS MATERIALIZED (
  SELECT CAST(SUM(c) AS BIGINT) AS total FROM per
)
SELECT event_type, c AS n,
       CAST(ROUND(CAST(c AS DOUBLE) / t.total * 1000000, 0)
            AS BIGINT) AS share_ppm,
       CAST(CEIL(LOG2(t.total / CAST(c AS DOUBLE))) AS BIGINT)
         AS code_len_bits
FROM per, tot t ORDER BY event_type
"""


def register_r4ff(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "relational_division_suppliers":
                q_relational_division_suppliers,
            "markov_stationary_distribution":
                q_markov_stationary_distribution,
            "shannon_code_length": q_shannon_code_length,
        }
    )
    oracles.update(
        {
            "relational_division_suppliers": DIVISION_SQL,
            "markov_stationary_distribution": MARKOV_STATIONARY_SQL,
            "shannon_code_length": SHANNON_SQL,
        }
    )

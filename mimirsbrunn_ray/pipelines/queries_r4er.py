"""Round-4 batch ER: Markov removal-effect attribution (the
absorbing-chain companion to the Shapley batch), first-vs-later
session conversion lift, and within-journey channel position bias.

Exactness discipline: the Markov chain runs as a 12-step INTEGER
probability iteration — transition probabilities are floor-divided
ppm, every mass transfer is (p * ppm) // 1e6 per edge — mirrored by
an UNROLLED SQL CTE chain (the pagerank/kmeans discipline), so
conversion masses compare as exact int64; session numbering and
conversion counts are pure integers; position bias snaps each
relative position x1e9 before its integer fold."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge

_SESSION_GAP_US = 1_800_000_000
_MK_STEPS = 12
_START = "__start__"


def _round_half_away(x: float) -> int:
    return int(np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5))


def _not_null(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


def _transition_counts(sf_dir):
    """Distributed (from, to) transition counts over per-user
    (ts, event_id)-ordered event streams, with a __start__ -> first
    pseudo-transition per user. One user-id hash-bucket shuffle."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def project(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("user_id", "ts", "event_type"))
        t = pa.table(
            {
                "user_id": b["user_id"],
                "us": b["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
                "event_id": b["event_id"],
                "event_type": b["event_type"],
            }
        )
        return add_bucket(t, "user_id", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "from_state": pd.Series([], dtype=object),
                "to_state": pd.Series([], dtype=object),
                "cnt": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(
            ["user_id", "us", "event_id"], kind="mergesort",
            ignore_index=True,
        )
        uid = g["user_id"].to_numpy(dtype=np.int64)
        et = g["event_type"].to_numpy()
        first = np.concatenate(([True], uid[1:] != uid[:-1]))
        frm = np.where(first, _START, np.concatenate(([""], et[:-1])))
        df = pd.DataFrame({"from_state": frm, "to_state": et})
        cnt = (
            df.groupby(["from_state", "to_state"])
            .size()
            .reset_index(name="cnt")
        )
        cnt["cnt"] = cnt["cnt"].astype(np.int64)
        return cnt

    parts = (
        ev.map_batches(project, batch_format="pyarrow", batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if not len(parts) or "from_state" not in parts.columns:
        return pd.DataFrame(
            {"from_state": [], "to_state": [], "cnt": []}
        )
    return parts.groupby(
        ["from_state", "to_state"], as_index=False
    )["cnt"].sum()


def q_markov_removal_attribution(sf_dir):
    """Markov removal-effect attribution: model the per-user event
    stream as a first-order chain (plus a __start__ state), compute
    the probability of reaching 'purchase' within 12 steps, then
    re-run the chain with each channel REMOVED (transitions into it
    vanish) — the removal effect 1 - conv_removed/conv_full is the
    channel's share of conversion flow (Anderl et al.'s attribution).
    The iteration is pure integer arithmetic: ppm transition probs by
    floor division, each mass transfer (p * ppm) // 1e6, so an
    unrolled 12-step SQL CTE chain verifies the conversion masses
    exactly; only the closing effect ratio is snapped."""
    trans = _transition_counts(sf_dir)
    cols = ["variant", "conv_ppm", "removal_effect_x1e6"]
    if not len(trans):
        return pa.table(
            {
                "variant": pa.array([], pa.string()),
                "conv_ppm": pa.array([], pa.int64()),
                "removal_effect_x1e6": pa.array([], pa.int64()),
            }
        )
    out_tot = trans.groupby("from_state")["cnt"].sum().to_dict()
    ppm = {
        (r.from_state, r.to_state): int(r.cnt) * 1_000_000
        // int(out_tot[r.from_state])
        for r in trans.itertuples()
    }
    states = sorted(
        set(trans["from_state"]) | set(trans["to_state"])
    )
    channels = sorted(
        s for s in states if s not in (_START, "purchase")
    )
    variants = ["__full__"] + channels

    def run(removed: str) -> int:
        p = {_START: 1_000_000}
        conv = 0
        for _ in range(_MK_STEPS):
            new_p: dict = {}
            for s, mass in p.items():
                if s == removed or mass == 0:
                    continue
                for (f, to), pr in ppm.items():
                    if f != s:
                        continue
                    moved = (mass * pr) // 1_000_000
                    if to == "purchase":
                        conv += moved
                    elif to != removed:
                        new_p[to] = new_p.get(to, 0) + moved
            p = new_p
        return conv

    conv_full = run("__none__")
    rows = {c: [] for c in cols}
    for v in variants:
        cv = conv_full if v == "__full__" else run(v)
        eff = None
        if v != "__full__" and conv_full > 0:
            eff = _round_half_away(
                (1.0 - float(cv) / float(conv_full)) * 1e6
            )
        rows["variant"].append(v)
        rows["conv_ppm"].append(cv)
        rows["removal_effect_x1e6"].append(eff)
    return pa.table(
        {
            "variant": pa.array(rows["variant"], pa.string()),
            "conv_ppm": pa.array(rows["conv_ppm"], pa.int64()),
            "removal_effect_x1e6": pa.array(
                rows["removal_effect_x1e6"], pa.int64()
            ),
        }
    )


_MK_STEP_TPL = """
st{n} AS MATERIALIZED (
  SELECT r.variant, pp.to_state AS state,
         CAST(SUM((r.p * pp.ppm) // 1000000) AS BIGINT) AS p
  FROM st{m} r JOIN ppm pp ON pp.from_state = r.state
  WHERE pp.to_state <> 'purchase' AND pp.to_state <> r.variant
    AND r.state <> r.variant
  GROUP BY 1, 2
),
cv{n} AS MATERIALIZED (
  SELECT r.variant,
         CAST(SUM((r.p * pp.ppm) // 1000000) AS BIGINT) AS conv
  FROM st{m} r JOIN ppm pp ON pp.from_state = r.state
                          AND pp.to_state = 'purchase'
  WHERE r.state <> r.variant
  GROUP BY 1
),"""

MARKOV_SQL = (
    """
WITH e AS MATERIALIZED (
  SELECT user_id, EPOCH_US(ts) AS us, event_id, event_type
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL
), seq AS MATERIALIZED (
  SELECT event_type AS to_state,
         COALESCE(LAG(event_type) OVER
           (PARTITION BY user_id ORDER BY us, event_id),
           '__start__') AS from_state
  FROM e
), trans AS MATERIALIZED (
  SELECT from_state, to_state, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM seq GROUP BY 1, 2
), outt AS MATERIALIZED (
  SELECT from_state, CAST(SUM(cnt) AS BIGINT) AS tot
  FROM trans GROUP BY 1
), ppm AS MATERIALIZED (
  SELECT t.from_state, t.to_state,
         CAST(t.cnt * 1000000 // o.tot AS BIGINT) AS ppm
  FROM trans t JOIN outt o ON o.from_state = t.from_state
), variants AS MATERIALIZED (
  SELECT '__full__' AS variant
  UNION ALL
  SELECT DISTINCT event_type FROM e WHERE event_type <> 'purchase'
), st0 AS MATERIALIZED (
  SELECT variant, '__start__' AS state,
         CAST(1000000 AS BIGINT) AS p
  FROM variants
),"""
    + "".join(
        _MK_STEP_TPL.format(n=i, m=i - 1) for i in range(1, _MK_STEPS + 1)
    )
    + """
allcv AS (
"""
    + "\n  UNION ALL\n".join(
        f"  SELECT variant, conv FROM cv{i}"
        for i in range(1, _MK_STEPS + 1)
    )
    + """
), tot AS MATERIALIZED (
  SELECT v.variant, CAST(COALESCE(SUM(a.conv), 0) AS BIGINT)
           AS conv_ppm
  FROM variants v LEFT JOIN allcv a ON a.variant = v.variant
  GROUP BY 1
), full_cv AS MATERIALIZED (
  SELECT conv_ppm AS cf FROM tot WHERE variant = '__full__'
)
SELECT t.variant, t.conv_ppm,
       CASE WHEN t.variant <> '__full__' AND f.cf > 0 THEN
         CAST(ROUND((1.0 - CAST(t.conv_ppm AS DOUBLE)
              / CAST(f.cf AS DOUBLE)) * 1000000.0, 0) AS BIGINT)
       END AS removal_effect_x1e6
FROM tot t CROSS JOIN full_cv f
ORDER BY 1
"""
)


# ---------------------------------------------------------------------------
# First-vs-later session conversion lift
# ---------------------------------------------------------------------------


def q_first_session_conversion_lift(sf_dir):
    """Do returning sessions convert better than first sessions?
    Sessions are 30-min-gap per user, numbered by start time; a
    session converts if it contains a purchase. Emits the four exact
    counts plus per-group ppm rates and the later/first lift — the
    retention-value headline number. One user-id hash-bucket
    shuffle; only the rates and lift are snapped."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def project(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("user_id", "ts", "event_type"))
        t = pa.table(
            {
                "user_id": b["user_id"],
                "us": b["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
                "event_id": b["event_id"],
                "event_type": b["event_type"],
            }
        )
        return add_bucket(t, "user_id", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "n_first": pd.Series([], dtype=np.int64),
                "conv_first": pd.Series([], dtype=np.int64),
                "n_later": pd.Series([], dtype=np.int64),
                "conv_later": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(
            ["user_id", "us", "event_id"], kind="mergesort",
            ignore_index=True,
        )
        uid = g["user_id"].to_numpy(dtype=np.int64)
        us = g["us"].to_numpy(dtype=np.int64)
        first = np.concatenate(([True], uid[1:] != uid[:-1]))
        gap = np.concatenate(([0], us[1:] - us[:-1]))
        brk = first | (gap > _SESSION_GAP_US)
        sid = np.cumsum(brk)
        # session index within user: cumsum of breaks per user
        sess_first = np.cumsum(first)  # user ordinal per row
        df = pd.DataFrame(
            {
                "sid": sid,
                "uord": sess_first,
                "conv": (
                    g["event_type"].to_numpy() == "purchase"
                ).astype(np.int64),
                "brk": brk.astype(np.int64),
            }
        )
        sess = df.groupby("sid").agg(
            uord=("uord", "first"), conv=("conv", "max")
        )
        # first session of a user = the first sid within each uord
        first_sid = sess.reset_index().groupby("uord")["sid"].min()
        sess["is_first"] = sess.index.isin(set(first_sid))
        n_first = int(sess["is_first"].sum())
        conv_first = int(sess.loc[sess["is_first"], "conv"].sum())
        n_later = int((~sess["is_first"]).sum())
        conv_later = int(sess.loc[~sess["is_first"], "conv"].sum())
        return pd.DataFrame(
            {
                "n_first": [np.int64(n_first)],
                "conv_first": [np.int64(conv_first)],
                "n_later": [np.int64(n_later)],
                "conv_later": [np.int64(conv_later)],
            }
        )

    parts = (
        ev.map_batches(project, batch_format="pyarrow", batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    nf = int(parts["n_first"].sum()) if len(parts) else 0
    cf = int(parts["conv_first"].sum()) if len(parts) else 0
    nl = int(parts["n_later"].sum()) if len(parts) else 0
    cl = int(parts["conv_later"].sum()) if len(parts) else 0
    rate_f = (
        None if nf == 0
        else _round_half_away(float(cf) / float(nf) * 1e6)
    )
    rate_l = (
        None if nl == 0
        else _round_half_away(float(cl) / float(nl) * 1e6)
    )
    lift = None
    if nf > 0 and nl > 0 and cf > 0:
        lift = _round_half_away(
            (float(cl) / float(nl)) / (float(cf) / float(nf)) * 1e6
        )
    return pa.table(
        {
            "n_first": pa.array([nf], pa.int64()),
            "conv_first": pa.array([cf], pa.int64()),
            "n_later": pa.array([nl], pa.int64()),
            "conv_later": pa.array([cl], pa.int64()),
            "rate_first_ppm": pa.array([rate_f], pa.int64()),
            "rate_later_ppm": pa.array([rate_l], pa.int64()),
            "lift_x1e6": pa.array([lift], pa.int64()),
        }
    )


FIRST_SESSION_SQL = f"""
WITH e AS MATERIALIZED (
  SELECT user_id, EPOCH_US(ts) AS us, event_id, event_type
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL
), lagd AS MATERIALIZED (
  SELECT user_id, us, event_type,
         CASE WHEN us - LAG(us) OVER w > {_SESSION_GAP_US}
              OR LAG(us) OVER w IS NULL THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
), sess AS MATERIALIZED (
  SELECT user_id, event_type,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY us
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM lagd
), per_sess AS MATERIALIZED (
  SELECT user_id, sid,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS conv,
         CASE WHEN sid = 1 THEN 1 ELSE 0 END AS is_first
  FROM sess GROUP BY 1, 2
), agg AS (
  SELECT
    CAST(SUM(is_first) AS BIGINT) AS n_first,
    CAST(SUM(CASE WHEN is_first = 1 THEN conv ELSE 0 END) AS BIGINT)
      AS conv_first,
    CAST(SUM(1 - is_first) AS BIGINT) AS n_later,
    CAST(SUM(CASE WHEN is_first = 0 THEN conv ELSE 0 END) AS BIGINT)
      AS conv_later
  FROM per_sess
)
SELECT n_first, conv_first, n_later, conv_later,
       CASE WHEN n_first > 0 THEN
         CAST(ROUND(CAST(conv_first AS DOUBLE)
              / CAST(n_first AS DOUBLE) * 1000000.0, 0) AS BIGINT)
       END AS rate_first_ppm,
       CASE WHEN n_later > 0 THEN
         CAST(ROUND(CAST(conv_later AS DOUBLE)
              / CAST(n_later AS DOUBLE) * 1000000.0, 0) AS BIGINT)
       END AS rate_later_ppm,
       CASE WHEN n_first > 0 AND n_later > 0 AND conv_first > 0 THEN
         CAST(ROUND((CAST(conv_later AS DOUBLE)
              / CAST(n_later AS DOUBLE))
              / (CAST(conv_first AS DOUBLE)
                 / CAST(n_first AS DOUBLE)) * 1000000.0, 0) AS BIGINT)
       END AS lift_x1e6
FROM agg
"""


# ---------------------------------------------------------------------------
# Channel position bias in converting sessions
# ---------------------------------------------------------------------------


def q_channel_position_bias(sf_dir):
    """Within converting 30-min-gap sessions of length >= 2: the mean
    normalized position (0 = session start, 1 = end) of each
    non-purchase channel's occurrences — does 'view' open journeys
    while 'click' closes them? Positions are exact integers; each
    relative position pos/(len-1) snaps x1e9 before the per-channel
    integer fold; the mean closes with one mirrored division."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def project(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("user_id", "ts", "event_type"))
        t = pa.table(
            {
                "user_id": b["user_id"],
                "us": b["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
                "event_id": b["event_id"],
                "event_type": b["event_type"],
            }
        )
        return add_bucket(t, "user_id", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "channel": pd.Series([], dtype=object),
                "n_occ": pd.Series([], dtype=np.int64),
                "sum_rel9": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(
            ["user_id", "us", "event_id"], kind="mergesort",
            ignore_index=True,
        )
        uid = g["user_id"].to_numpy(dtype=np.int64)
        us = g["us"].to_numpy(dtype=np.int64)
        first = np.concatenate(([True], uid[1:] != uid[:-1]))
        gap = np.concatenate(([0], us[1:] - us[:-1]))
        sid = np.cumsum(first | (gap > _SESSION_GAP_US))
        et = g["event_type"].to_numpy()
        df = pd.DataFrame({"sid": sid, "et": et})
        df["pos"] = df.groupby("sid").cumcount()
        sess = df.groupby("sid").agg(
            slen=("pos", "size"),
            conv=("et", lambda x: int((x == "purchase").any())),
        )
        df = df.join(sess, on="sid")
        df = df[
            (df["conv"] == 1)
            & (df["slen"] >= 2)
            & (df["et"] != "purchase")
        ]
        if not len(df):
            return empty
        rel9 = np.array(
            [
                _round_half_away(float(p) / float(sl - 1) * 1e9)
                for p, sl in zip(df["pos"], df["slen"])
            ],
            dtype=np.int64,
        )
        df = df.assign(rel9=rel9)
        agg = df.groupby("et").agg(
            n_occ=("rel9", "size"), sum_rel9=("rel9", "sum")
        )
        return pd.DataFrame(
            {
                "channel": agg.index.to_numpy(),
                "n_occ": agg["n_occ"].to_numpy(dtype=np.int64),
                "sum_rel9": agg["sum_rel9"].to_numpy(dtype=np.int64),
            }
        )

    parts = (
        ev.map_batches(project, batch_format="pyarrow", batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    cols = ["channel", "n_occ", "mean_pos_x1e9"]
    if not len(parts) or "channel" not in parts.columns:
        return pa.table(
            {
                "channel": pa.array([], pa.string()),
                "n_occ": pa.array([], pa.int64()),
                "mean_pos_x1e9": pa.array([], pa.int64()),
            }
        )
    agg = parts.groupby("channel", as_index=False)[
        ["n_occ", "sum_rel9"]
    ].sum()
    agg = agg.sort_values("channel", ignore_index=True)
    mean9 = np.array(
        [
            _round_half_away(float(s) / float(n))
            for s, n in zip(agg["sum_rel9"], agg["n_occ"])
        ],
        dtype=np.int64,
    )
    return pa.table(
        {
            "channel": pa.array(agg["channel"].tolist(), pa.string()),
            "n_occ": pa.array(
                agg["n_occ"].to_numpy(dtype=np.int64)
            ),
            "mean_pos_x1e9": pa.array(mean9),
        }
    )


POSITION_BIAS_SQL = f"""
WITH e AS MATERIALIZED (
  SELECT user_id, EPOCH_US(ts) AS us, event_id, event_type
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL
), lagd AS MATERIALIZED (
  SELECT user_id, us, event_id, event_type,
         CASE WHEN us - LAG(us) OVER w > {_SESSION_GAP_US}
              OR LAG(us) OVER w IS NULL THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
), sess AS MATERIALIZED (
  SELECT user_id, us, event_id, event_type,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM lagd
), pos AS MATERIALIZED (
  SELECT user_id, sid, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, sid
                            ORDER BY us, event_id) - 1 AS pos,
         COUNT(*) OVER (PARTITION BY user_id, sid) AS slen,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id, sid) AS conv
  FROM sess
), occ AS MATERIALIZED (
  SELECT event_type AS channel,
         CAST(ROUND(CAST(pos AS DOUBLE) / CAST(slen - 1 AS DOUBLE)
              * 1000000000, 0) AS BIGINT) AS rel9
  FROM pos
  WHERE conv = 1 AND slen >= 2 AND event_type <> 'purchase'
)
SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_occ,
       CAST(ROUND(CAST(SUM(rel9) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE), 0) AS BIGINT)
         AS mean_pos_x1e9
FROM occ GROUP BY 1 ORDER BY 1
"""


def register_r4er(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "markov_removal_attribution": q_markov_removal_attribution,
            "first_session_conversion_lift":
                q_first_session_conversion_lift,
            "channel_position_bias": q_channel_position_bias,
        }
    )
    oracles.update(
        {
            "markov_removal_attribution": MARKOV_SQL,
            "first_session_conversion_lift": FIRST_SESSION_SQL,
            "channel_position_bias": POSITION_BIAS_SQL,
        }
    )

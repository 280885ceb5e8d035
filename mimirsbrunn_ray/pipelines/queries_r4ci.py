"""Round-4 batch CI: Chao1 vocabulary-richness + Good-Turing unseen
mass, CVaR (expected shortfall) per event type, and a Jarque-Bera
log-normality test on document lengths.

Exactness discipline: every statistic reduces to exact int64
sufficient statistics (frequency-of-frequency counts, bounded-domain
value histograms, fixed-point log power sums) via combiner-first
partials + tree_merge; each final float expression is mirrored
token-for-token against the DuckDB oracle and snapped to fixed point.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(
        np.int64
    )


def _clean(b: pa.Table, cols: tuple[str, ...]) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


def _sum_by(t: pa.Table, keys: list[str], vals: list[str]) -> pa.Table:
    g = t.group_by(keys).aggregate([(v, "sum") for v in vals])
    g = g.select(keys + [f"{v}_sum" for v in vals])
    return g.rename_columns(keys + vals)


# ---------------------------------------------------------------------------
# Chao1 richness + Good-Turing unseen mass per source
# ---------------------------------------------------------------------------


def q_vocab_chao1_per_source(sf_dir):
    """Per source: observed vocabulary size, bias-corrected Chao1
    estimate of the TRUE vocabulary size (d + f1*(f1-1)/(2*(f2+1)),
    from singleton/doubleton counts — how much vocabulary the sample
    hasn't seen yet), and the Good-Turing unseen-probability mass
    f1/N — the two standard species-richness diagnostics a corpus
    curator reads before claiming coverage. Word counts ride the
    vocabulary-grain shuffle (sharded tree_merge, never one driver
    dict); f1/f2/d/N fold per shard, the bounded per-source row does
    one mirrored double each."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("source", "text"))
        words = pc.split_pattern(b["text"], pattern=" ")
        n_per = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(words)
        src = pa.array(
            np.repeat(b["source"].to_numpy(zero_copy_only=False), n_per)
        )
        t = pa.table({"source": src, "w": flat})
        g = t.group_by(["source", "w"]).aggregate([([], "count_all")])
        g = g.select(["source", "w", "count_all"])
        return g.rename_columns(["source", "w", "c"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["source", "w"]).aggregate([("c", "sum")])
        return g.rename_columns(["source", "w", "c"])

    vocab = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
        final_shards=8,
        shard_cols=["source", "w"],
    )

    def fold(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "source": pa.array([], pa.string()),
                "d": pa.array([], pa.int64()),
                "ntok": pa.array([], pa.int64()),
                "f1": pa.array([], pa.int64()),
                "f2": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0 or "source" not in b.column_names:
            return empty
        c = b["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table(
            {
                "source": b["source"],
                "d": pa.array(np.ones(len(c), dtype=np.int64)),
                "ntok": pa.array(c),
                "f1": pa.array((c == 1).astype(np.int64)),
                "f2": pa.array((c == 2).astype(np.int64)),
            }
        )
        return _sum_by(t, ["source"], ["d", "ntok", "f1", "f2"])

    def fold_combine(b: pa.Table) -> pa.Table:
        return _sum_by(b, ["source"], ["d", "ntok", "f1", "f2"])

    m = tree_merge(
        vocab.map_batches(fold, batch_format="pyarrow", batch_size=None),
        fold_combine,
    ).to_pandas()  # bounded: one row per source

    if not len(m) or "source" not in m.columns:
        return pa.table(
            {
                "source": pa.array([], pa.string()),
                "d": pa.array([], pa.int64()),
                "ntok": pa.array([], pa.int64()),
                "chao1_x1e3": pa.array([], pa.int64()),
                "p0_x1e6": pa.array([], pa.int64()),
            }
        )
    m = m.sort_values("source", ignore_index=True)
    d = m["d"].to_numpy(dtype=np.int64)
    ntok = m["ntok"].to_numpy(dtype=np.int64)
    f1 = m["f1"].to_numpy(dtype=np.int64)
    f2 = m["f2"].to_numpy(dtype=np.int64)
    chao1 = _round_half_away(
        (d + (f1 * (f1 - 1)).astype(np.float64) / (2 * (f2 + 1))) * 1000
    )
    p0 = _round_half_away(f1.astype(np.float64) / ntok * 1000000)
    return pa.table(
        {
            "source": pa.array(m["source"], pa.string()),
            "d": pa.array(d),
            "ntok": pa.array(ntok),
            "chao1_x1e3": pa.array(chao1),
            "p0_x1e6": pa.array(p0),
        }
    )


CHAO1_SQL = """
WITH w AS (
  SELECT source, unnest(string_split(text, ' ')) AS word
  FROM documents
  WHERE source IS NOT NULL AND text IS NOT NULL
), c AS MATERIALIZED (
  SELECT source, word, CAST(COUNT(*) AS BIGINT) AS n
  FROM w GROUP BY 1, 2
), s AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS d,
         CAST(SUM(n) AS BIGINT) AS ntok,
         CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         CAST(SUM(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
  FROM c GROUP BY 1
)
SELECT source, d, ntok,
       CAST(ROUND((d + CAST(f1 * (f1 - 1) AS DOUBLE) / (2 * (f2 + 1)))
                  * 1000, 0) AS BIGINT) AS chao1_x1e3,
       CAST(ROUND(CAST(f1 AS DOUBLE) / ntok * 1000000, 0) AS BIGINT)
         AS p0_x1e6
FROM s ORDER BY source
"""


# ---------------------------------------------------------------------------
# CVaR / expected shortfall per event type
# ---------------------------------------------------------------------------


def q_cvar_value_per_type(sf_dir):
    """Per event type: the exact p95 of value (PERCENTILE_DISC
    semantics on the centi-quantized value) and CVaR-95 — the mean of
    the tail AT OR ABOVE that quantile (expected shortfall, the
    coherent risk statistic: not just where the tail starts but how
    bad it is on average). One bounded (type, centi-value) histogram
    pass — the exact_quantiles_small_domain trick — gives quantile AND
    tail sums with no sort shuffle and no second scan."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "value"))
        x = _round_half_away(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
            * 100.0
        )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "x": pa.array(x),
                "n": pa.array(np.ones(len(x), dtype=np.int64)),
            }
        )
        return _sum_by(t, ["event_type", "x"], ["n"])

    def combine(b: pa.Table) -> pa.Table:
        return _sum_by(b, ["event_type", "x"], ["n"])

    hist = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: types x centi-value domain

    if not len(hist) or "event_type" not in hist.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "p95_x1e2": pa.array([], pa.int64()),
                "cvar_x1e4": pa.array([], pa.int64()),
            }
        )
    out = {"event_type": [], "n": [], "p95_x1e2": [], "cvar_x1e4": []}
    for et, g in hist.sort_values(["event_type", "x"]).groupby(
        "event_type", sort=True
    ):
        x = g["x"].to_numpy(dtype=np.int64)
        n = g["n"].to_numpy(dtype=np.int64)
        cum = n.cumsum()
        total = int(cum[-1])
        # PERCENTILE_DISC rank — the exact_quantiles_small_domain
        # convention that matches DuckDB quantile_disc
        rank = int(np.ceil(0.95 * total - 1e-9))
        idx = int(np.searchsorted(cum, rank))
        p95 = int(x[idx])
        tail_n = int(n[idx:].sum())
        tail_s = int((n[idx:] * x[idx:]).sum())
        cvar = int(
            _round_half_away(
                np.array([float(tail_s) / tail_n * 100.0])
            )[0]
        )
        out["event_type"].append(et)
        out["n"].append(total)
        out["p95_x1e2"].append(p95)
        out["cvar_x1e4"].append(cvar)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "p95_x1e2": pa.array(out["p95_x1e2"], pa.int64()),
            "cvar_x1e4": pa.array(out["cvar_x1e4"], pa.int64()),
        }
    )


CVAR_SQL = """
WITH v AS MATERIALIZED (
  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
), q AS MATERIALIZED (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         quantile_disc(x, 0.95) AS p95
  FROM v GROUP BY 1
)
SELECT q.event_type, q.n, q.p95 AS p95_x1e2,
       CAST(ROUND(CAST(SUM(v.x) AS DOUBLE) / COUNT(*) * 100, 0) AS BIGINT)
         AS cvar_x1e4
FROM v JOIN q ON v.event_type = q.event_type AND v.x >= q.p95
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Jarque-Bera log-normality test on document lengths
# ---------------------------------------------------------------------------


def q_jarque_bera_log_doclen(sf_dir):
    """Per source: the Jarque-Bera normality statistic of LN(n_chars)
    — the quantitative "are my document lengths log-normal?" test
    (JB = n/6 * (S^2 + (K-3)^2 / 4); large JB = the log-length
    distribution has skew/kurtosis a log-normal wouldn't). LN snaps to
    centi-nat fixed point (identical int inputs both engines; x <= ~1k
    keeps the x^4 power sums inside int64 up to ~1e6 docs — at larger
    corpora shift to mean-centered per-shard sums), then one mirrored
    double chain from the four exact power sums."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("source", "n_chars"))
        nch = b["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = nch > 0
        x = _round_half_away(np.log(nch[keep].astype(np.float64)) * 100.0)
        t = pa.table(
            {
                "source": b["source"].filter(pa.array(keep)),
                "n": pa.array(np.ones(len(x), dtype=np.int64)),
                "s1": pa.array(x),
                "s2": pa.array(x * x),
                "s3": pa.array(x * x * x),
                "s4": pa.array(x * x * x * x),
            }
        )
        return _sum_by(t, ["source"], ["n", "s1", "s2", "s3", "s4"])

    def combine(b: pa.Table) -> pa.Table:
        return _sum_by(b, ["source"], ["n", "s1", "s2", "s3", "s4"])

    m = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: one row per source

    if not len(m) or "source" not in m.columns:
        return pa.table(
            {
                "source": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "jb_x1e3": pa.array([], pa.int64()),
            }
        )
    m = m.sort_values("source", ignore_index=True)
    n = m["n"].to_numpy(dtype=np.int64)
    nf = n.astype(np.float64)
    r1 = m["s1"].to_numpy(dtype=np.int64) / nf
    r2 = m["s2"].to_numpy(dtype=np.int64) / nf
    r3 = m["s3"].to_numpy(dtype=np.int64) / nf
    r4 = m["s4"].to_numpy(dtype=np.int64) / nf
    mu = r1
    m2 = r2 - mu * mu
    m3 = r3 - 3 * mu * r2 + 2 * mu * mu * mu
    m4 = r4 - 4 * mu * r3 + 6 * mu * mu * r2 - 3 * mu * mu * mu * mu
    ok = m2 > 0
    m2s = np.where(ok, m2, 1.0)
    s = m3 / (m2s * np.sqrt(m2s))
    k = m4 / (m2s * m2s)
    jb = nf / 6 * (s * s + (k - 3) * (k - 3) / 4)
    vals = np.where(ok, _round_half_away(jb * 1000), 0)
    vals = np.where(ok, vals, None)
    return pa.table(
        {
            "source": pa.array(m["source"], pa.string()),
            "n": pa.array(n),
            "jb_x1e3": pa.array(vals.tolist(), pa.int64()),
        }
    )


JB_SQL = """
WITH v AS (
  SELECT source, CAST(ROUND(LN(n_chars) * 100, 0) AS BIGINT) AS x
  FROM documents
  WHERE source IS NOT NULL AND n_chars IS NOT NULL AND n_chars > 0
), s AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s1,
         CAST(SUM(x * x) AS BIGINT) AS s2,
         CAST(SUM(x * x * x) AS BIGINT) AS s3,
         CAST(SUM(x * x * x * x) AS BIGINT) AS s4
  FROM v GROUP BY 1
), r AS (
  SELECT source, n,
         CAST(s1 AS DOUBLE) / n AS r1,
         CAST(s2 AS DOUBLE) / n AS r2,
         CAST(s3 AS DOUBLE) / n AS r3,
         CAST(s4 AS DOUBLE) / n AS r4
  FROM s
), mm AS (
  SELECT source, n, r1 AS mu,
         r2 - r1 * r1 AS m2,
         r3 - 3 * r1 * r2 + 2 * r1 * r1 * r1 AS m3,
         r4 - 4 * r1 * r3 + 6 * r1 * r1 * r2 - 3 * r1 * r1 * r1 * r1 AS m4
  FROM r
)
SELECT source, n,
       CASE WHEN m2 > 0 THEN CAST(ROUND(
         CAST(n AS DOUBLE) / 6 * (
           (m3 / (m2 * SQRT(m2))) * (m3 / (m2 * SQRT(m2)))
           + (m4 / (m2 * m2) - 3) * (m4 / (m2 * m2) - 3) / 4
         ) * 1000, 0) AS BIGINT) ELSE NULL END AS jb_x1e3
FROM mm ORDER BY source
"""


def register_r4ci(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "vocab_chao1_per_source": q_vocab_chao1_per_source,
            "cvar_value_per_type": q_cvar_value_per_type,
            "jarque_bera_log_doclen": q_jarque_bera_log_doclen,
        }
    )
    oracles.update(
        {
            "vocab_chao1_per_source": CHAO1_SQL,
            "cvar_value_per_type": CVAR_SQL,
            "jarque_bera_log_doclen": JB_SQL,
        }
    )

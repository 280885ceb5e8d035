"""Round-4 batch CO: Gorilla XOR value-plane compression audit,
character-bigram conditional entropy per source, and two-factor
(hour + day-of-week) seasonality R².

The XOR audit is the value-plane companion to the delta-of-delta
timestamp audit (both measure how compressible each type's stream is
under the scheme stages/compress.py implements). The bigram entropy is
the classic Shannon text-complexity screen (low conditional entropy =
templated/generated text). Exactness: counts fold exact int64; bit
lengths come from exact integer machinery on BOTH sides (numpy frexp
exponents vs DuckDB length(bin(x)) — no float log anywhere near a
boundary); entropies/R² are mirrored double folds over bounded tables,
x1e6 snap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.dedup import _BUCKET
from mimirsbrunn_ray.stages.rollup import tree_merge
from mimirsbrunn_ray.stages.timeseries import (
    _project_series,
    _round_half_away_x,
    _series_segments,
)

_HOUR_US = 3_600_000_000
_DAY_US = 86_400_000_000


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(
        np.int64
    )


def _sum_by(t: pa.Table, keys: list[str], vals: list[str]) -> pa.Table:
    g = t.group_by(keys).aggregate([(v, "sum") for v in vals])
    g = g.select(keys + [f"{v}_sum" for v in vals])
    return g.rename_columns(keys + vals)


def _clean(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


# ---------------------------------------------------------------------------
# Gorilla XOR value-plane compression bit audit
# ---------------------------------------------------------------------------


def q_xor_value_compression_bits(sf_dir):
    """Per event type: bits a simplified Gorilla XOR value codec needs
    for the ordered x100-quantized value stream — series head costs 64
    bits; each later point XORs the ZIGZAG encodings of consecutive
    values and pays 1 bit when identical, else a 7-bit control+length
    header plus the XOR's exact bit length. Bit lengths are exact
    integers on both sides: numpy frexp exponents (exact for ints <
    2^53) vs DuckDB length(bin(x)) — no float log near a boundary. One
    series-key hash shuffle, everything int64."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
    )
    proj = _project_series(ev, "event_type", "ts", "event_id", "value", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
                "bits": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, same = _series_segments(g, "event_type", "ts", "event_id")
        x = _round_half_away_x(g["value"].to_numpy(dtype=np.float64), 100.0)
        zz = np.where(x >= 0, 2 * x, -2 * x - 1)
        xz = np.zeros(len(g), dtype=np.int64)
        xz[1:] = np.bitwise_xor(zz[1:], zz[:-1])
        # exact bit length: frexp exponent of an exact-in-double integer
        _, e = np.frexp(np.maximum(xz, 1).astype(np.float64))
        blen = e.astype(np.int64)
        bits = np.where(xz == 0, 1, 7 + blen)
        per_row = np.where(same, bits, 64)
        out = pd.DataFrame({"event_type": g["event_type"], "b": per_row})
        a = out.groupby("event_type", sort=False)["b"].agg(n="size", bits="sum")
        return a.reset_index().astype({"n": np.int64, "bits": np.int64})

    stats = (
        proj.groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if not len(stats) or "event_type" not in stats.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "bits": pa.array([], pa.int64()),
                "bits_per_point_x1e6": pa.array([], pa.int64()),
            }
        )
    stats = stats.sort_values("event_type", ignore_index=True)
    n = stats["n"].to_numpy(dtype=np.int64)
    bits = stats["bits"].to_numpy(dtype=np.int64)
    return pa.table(
        {
            "event_type": pa.array(stats["event_type"].tolist(), pa.string()),
            "n": pa.array(n),
            "bits": pa.array(bits),
            "bits_per_point_x1e6": pa.array(
                _round_half_away(bits.astype(np.float64) / n * 1e6)
            ),
        }
    )


XOR_BITS_SQL = """
WITH v AS (
  SELECT event_type, ts, event_id,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), zz AS (
  SELECT event_type, ts, event_id,
         CASE WHEN x >= 0 THEN 2 * x ELSE -2 * x - 1 END AS z
  FROM v
), lagd AS (
  SELECT event_type,
         CASE WHEN LAG(z) OVER w IS NULL THEN NULL
              ELSE xor(z, LAG(z) OVER w) END AS xz
  FROM zz WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), bitsed AS (
  SELECT event_type,
         CASE WHEN xz IS NULL THEN 64
              WHEN xz = 0 THEN 1
              ELSE 7 + length(bin(xz)) END AS b
  FROM lagd
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(b) AS BIGINT) AS bits,
       CAST(ROUND(CAST(SUM(b) AS DOUBLE) / COUNT(*) * 1000000, 0)
            AS BIGINT) AS bits_per_point_x1e6
FROM bitsed GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# character-bigram conditional entropy per source
# ---------------------------------------------------------------------------


def q_char_bigram_entropy(sf_dir):
    """Per source: Shannon entropy of the character-BIGRAM distribution
    and the conditional entropy H(c2 | c1) = H(bigram) - H(first-char
    marginal) over adjacent in-document character pairs — the
    text-complexity screen that flags templated/generated corpora (low
    conditional entropy = each character is predictable from its
    predecessor). The pair scan is one zero-copy pass over the Arrow
    string buffer: texts concatenate to a byte array, document
    boundaries mask cross-doc pairs, and a bincount over 256*c1+c2
    yields the sparse (source, code, count) partials that tree-merge
    into a bounded (sources x observed-bigrams) table. Entropies are
    mirrored double folds (nats), x1e6 snap."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("source", "text"))
        if b.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "code": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                }
            )
        s = b["source"].to_pandas()
        texts = b["text"].to_pandas()
        lens = texts.str.len().to_numpy(dtype=np.int64)
        blob = np.frombuffer(
            "".join(texts.tolist()).encode("utf-8"), dtype=np.uint8
        ).astype(np.int64)
        # pair at global position p is valid unless p is a doc's last char
        ends = np.cumsum(lens) - 1  # last-char positions
        valid = np.ones(max(len(blob) - 1, 0), dtype=bool)
        valid[ends[(ends >= 0) & (ends < len(blob) - 1)]] = False
        code = blob[:-1] * 256 + blob[1:]
        src_idx = np.repeat(np.arange(len(lens)), lens)[:-1]
        su, si = np.unique(s.to_numpy(), return_inverse=True)
        pair_src = si[src_idx][valid]
        pair_code = code[valid]
        key = pair_src * 65536 + pair_code
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "source": pa.array(su[(uk // 65536)], pa.string()),
                "code": pa.array((uk % 65536).astype(np.int64)),
                "c": pa.array(cnt.astype(np.int64)),
            }
        )

    cont = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["source", "code"], ["c"]),
    ).to_pandas()  # bounded: sources x observed bigram alphabet

    if not len(cont) or "source" not in cont.columns:
        return pa.table(
            {
                "source": pa.array([], pa.string()),
                "n_bigrams": pa.array([], pa.int64()),
                "h_bigram_x1e6": pa.array([], pa.int64()),
                "h_cond_x1e6": pa.array([], pa.int64()),
            }
        )
    out = {"source": [], "n_bigrams": [], "h_bigram_x1e6": [], "h_cond_x1e6": []}
    for src, g in cont.sort_values(["source", "code"]).groupby(
        "source", sort=True
    ):
        c = g["c"].to_numpy(dtype=np.int64)
        n = int(c.sum())
        p = c.astype(np.float64) / n
        h_big = -float(np.sum(p * np.log(p)))
        first = g["code"].to_numpy(dtype=np.int64) // 256
        mc = pd.Series(c).groupby(first).sum().to_numpy()
        pm = mc.astype(np.float64) / n
        h_first = -float(np.sum(pm * np.log(pm)))
        out["source"].append(src)
        out["n_bigrams"].append(n)
        out["h_bigram_x1e6"].append(
            int(_round_half_away(np.array([h_big * 1e6]))[0])
        )
        out["h_cond_x1e6"].append(
            int(_round_half_away(np.array([(h_big - h_first) * 1e6]))[0])
        )
    return pa.table(
        {
            "source": pa.array(out["source"], pa.string()),
            "n_bigrams": pa.array(out["n_bigrams"], pa.int64()),
            "h_bigram_x1e6": pa.array(out["h_bigram_x1e6"], pa.int64()),
            "h_cond_x1e6": pa.array(out["h_cond_x1e6"], pa.int64()),
        }
    )


CHAR_BIGRAM_SQL = """
WITH p AS (
  SELECT source, text,
         unnest(range(1, CAST(length(text) AS BIGINT))) AS g
  FROM documents
  WHERE source IS NOT NULL AND text IS NOT NULL
), c AS MATERIALIZED (
  SELECT source, substring(text, CAST(g AS INT), 2) AS bg,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM p GROUP BY 1, 2
), n AS MATERIALIZED (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM c GROUP BY 1
), hb AS (
  SELECT c.source,
         -SUM(CAST(c.c AS DOUBLE) / n.n * LN(CAST(c.c AS DOUBLE) / n.n))
           AS h
  FROM c JOIN n ON n.source = c.source GROUP BY 1
), m AS (
  SELECT source, substring(bg, 1, 1) AS c1, CAST(SUM(c) AS BIGINT) AS mc
  FROM c GROUP BY 1, 2
), hf AS (
  SELECT m.source,
         -SUM(CAST(m.mc AS DOUBLE) / n.n * LN(CAST(m.mc AS DOUBLE) / n.n))
           AS h
  FROM m JOIN n ON n.source = m.source GROUP BY 1
)
SELECT n.source, n.n AS n_bigrams,
       CAST(ROUND(hb.h * 1000000, 0) AS BIGINT) AS h_bigram_x1e6,
       CAST(ROUND((hb.h - hf.h) * 1000000, 0) AS BIGINT) AS h_cond_x1e6
FROM n
JOIN hb ON hb.source = n.source
JOIN hf ON hf.source = n.source
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# two-factor (hour + day-of-week) additive seasonality R² per type
# ---------------------------------------------------------------------------


def q_two_way_seasonality_r2(sf_dir):
    """Per event type: the R² of the ADDITIVE two-factor seasonal model
    fit = hour-mean + dow-mean - grand-mean on x100 values — how much of
    the variance the joint diurnal + weekly profile explains (the
    two-factor extension of the single-factor seasonality-strength
    queries). Cell sufficient statistics (n, s1, s2) per (type, hour,
    dow) fold exact int64 over one combiner-first pass (bounded: types x
    24 x 7); SSE folds the closed form s2 - 2*fit*s1 + n*fit² per cell
    with fit from exact marginal sums; R² = 1 - sse/sst is one mirrored
    double per type, x1e6 snap, NULL for degenerate total variance."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "ts", "value"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        h = ((us // _HOUR_US) % 24).astype(np.int64)
        d = ((np.floor_divide(us, _DAY_US) + 4) % 7).astype(np.int64)
        x = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64), 100.0
        )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "h": pa.array(h),
                "d": pa.array(d),
                "cnt": pa.array(np.ones(len(x), np.int64)),
                "s1": pa.array(x),
                "s2": pa.array(x * x),
            }
        )
        return _sum_by(t, ["event_type", "h", "d"], ["cnt", "s1", "s2"])

    cells = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type", "h", "d"], ["cnt", "s1", "s2"]),
    ).to_pandas()  # bounded: types x 24 x 7

    if not len(cells) or "event_type" not in cells.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "r2_x1e6": pa.array([], pa.int64()),
            }
        )
    out = {"event_type": [], "n": [], "r2_x1e6": []}
    for et, g in cells.sort_values(["event_type", "h", "d"]).groupby(
        "event_type", sort=True
    ):
        n_tot = int(g["cnt"].sum())
        s1_tot = int(g["s1"].sum())
        s2_tot = int(g["s2"].sum())
        gm = float(s1_tot) / n_tot
        hm = g.groupby("h")[["cnt", "s1"]].sum()
        dm = g.groupby("d")[["cnt", "s1"]].sum()
        h_mean = {
            int(k): float(r["s1"]) / r["cnt"] for k, r in hm.iterrows()
        }
        d_mean = {
            int(k): float(r["s1"]) / r["cnt"] for k, r in dm.iterrows()
        }
        sse = 0.0
        for _, row in g.iterrows():
            fit = h_mean[int(row["h"])] + d_mean[int(row["d"])] - gm
            sse += (
                float(row["s2"])
                - 2 * fit * float(row["s1"])
                + float(row["cnt"]) * fit * fit
            )
        sst = float(s2_tot) - float(s1_tot) * s1_tot / n_tot
        out["event_type"].append(et)
        out["n"].append(n_tot)
        out["r2_x1e6"].append(
            None
            if sst == 0.0
            else int(
                _round_half_away(np.array([(1.0 - sse / sst) * 1e6]))[0]
            )
        )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "r2_x1e6": pa.array(out["r2_x1e6"], pa.int64()),
        }
    )


TWO_WAY_R2_SQL = """
WITH v AS (
  SELECT event_type, hour(ts) AS h, dayofweek(ts) AS d,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), cell AS MATERIALIZED (
  SELECT event_type, h, d, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(x) AS BIGINT) AS s1, CAST(SUM(x * x) AS BIGINT) AS s2
  FROM v GROUP BY 1, 2, 3
), tot AS MATERIALIZED (
  SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n,
         CAST(SUM(s1) AS BIGINT) AS s1, CAST(SUM(s2) AS BIGINT) AS s2
  FROM cell GROUP BY 1
), hm AS MATERIALIZED (
  SELECT event_type, h, CAST(SUM(cnt) AS BIGINT) AS cnt,
         CAST(SUM(s1) AS BIGINT) AS s1
  FROM cell GROUP BY 1, 2
), dm AS MATERIALIZED (
  SELECT event_type, d, CAST(SUM(cnt) AS BIGINT) AS cnt,
         CAST(SUM(s1) AS BIGINT) AS s1
  FROM cell GROUP BY 1, 2
), sse AS (
  SELECT cell.event_type,
         SUM(cell.s2
             - 2 * (CAST(hm.s1 AS DOUBLE) / hm.cnt
                    + CAST(dm.s1 AS DOUBLE) / dm.cnt
                    - CAST(tot.s1 AS DOUBLE) / tot.n) * cell.s1
             + cell.cnt * (CAST(hm.s1 AS DOUBLE) / hm.cnt
                           + CAST(dm.s1 AS DOUBLE) / dm.cnt
                           - CAST(tot.s1 AS DOUBLE) / tot.n)
                        * (CAST(hm.s1 AS DOUBLE) / hm.cnt
                           + CAST(dm.s1 AS DOUBLE) / dm.cnt
                           - CAST(tot.s1 AS DOUBLE) / tot.n)) AS sse
  FROM cell
  JOIN hm ON hm.event_type = cell.event_type AND hm.h = cell.h
  JOIN dm ON dm.event_type = cell.event_type AND dm.d = cell.d
  JOIN tot ON tot.event_type = cell.event_type
  GROUP BY 1
)
SELECT tot.event_type, tot.n,
       CASE WHEN tot.s2 - CAST(tot.s1 AS DOUBLE) * tot.s1 / tot.n = 0
            THEN NULL
            ELSE CAST(ROUND(
              (1.0 - sse.sse
                     / (tot.s2 - CAST(tot.s1 AS DOUBLE) * tot.s1 / tot.n))
              * 1000000, 0) AS BIGINT) END AS r2_x1e6
FROM tot JOIN sse ON sse.event_type = tot.event_type
ORDER BY 1
"""


def register_r4co(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "xor_value_compression_bits": q_xor_value_compression_bits,
            "char_bigram_entropy": q_char_bigram_entropy,
            "two_way_seasonality_r2": q_two_way_seasonality_r2,
        }
    )
    oracles.update(
        {
            "xor_value_compression_bits": XOR_BITS_SQL,
            "char_bigram_entropy": CHAR_BIGRAM_SQL,
            "two_way_seasonality_r2": TWO_WAY_R2_SQL,
        }
    )

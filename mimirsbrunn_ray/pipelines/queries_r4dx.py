"""Round-4 batch DX: streaming frequency moments (F0/F1/F2) of the
word stream, Good-Turing adjusted counts, and the upper-tail joint
exceedance index between event-type pairs.

Exactness discipline: word counts fold on the exact (source, word)
grain and reduce to per-source integers (F2 = sum c^2 exact int64);
Good-Turing frequency-of-frequencies are exact integer histograms;
pair thresholds select by integer cross-multiplication (PERCENTILE_
DISC(0.75)); only the closing ratios are mirrored doubles, x1e6 snap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_HOUR_US = 3_600_000_000


def _round_half_away(x: float):
    return int(np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5))


def _sum_by(t: pa.Table, keys: list[str], vals: list[str]) -> pa.Table:
    g = t.group_by(keys).aggregate([(v, "sum") for v in vals])
    g = g.select(keys + [f"{v}_sum" for v in vals])
    return g.rename_columns(keys + vals)


def _word_counts(sf_dir) -> "rd.Dataset":
    """(source, word, c) exact counts — split-on-space lowered words,
    per-batch partials, sharded tree merge (the hapax/vocab front
    half; min-df prune first for open web-scale vocabularies)."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["source"]), pc.is_valid(b["text"]))
        )
        words = pc.split_pattern(pc.utf8_lower(b["text"]), " ")
        n_per = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(words)
        src = pa.chunked_array(
            [
                pa.array(
                    np.repeat(
                        b["source"].to_numpy(zero_copy_only=False), n_per
                    )
                )
            ]
        )
        t = pa.table({"source": src, "w": flat})
        g = t.group_by(["source", "w"]).aggregate([([], "count_all")])
        g = g.select(["source", "w", "count_all"])
        return g.rename_columns(["source", "w", "c"])

    return tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["source", "w"], ["c"]),
        final_shards=8,
        shard_cols=["source", "w"],
    )


# ---------------------------------------------------------------------------
# frequency moments F0 / F1 / F2 + surprise number per source
# ---------------------------------------------------------------------------


def q_frequency_moments_words(sf_dir):
    """Per source: the streaming frequency moments of the word stream —
    F0 (distinct words), F1 (stream length), F2 (sum of squared
    frequencies, the self-join size), and the surprise number F2/F1
    (the repeat-factor a skewed vocabulary inflates; F2/F1 = 1 means
    every word is a hapax). F0/F1/F2 fold exactly on the vocabulary
    grain; the surprise ratio is a mirrored double, x1e6 snap."""
    vocab = _word_counts(sf_dir)

    def fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "source" not in b.column_names:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "f0": pa.array([], pa.int64()),
                    "f1": pa.array([], pa.int64()),
                    "f2": pa.array([], pa.int64()),
                }
            )
        c = b["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table(
            {
                "source": b["source"],
                "f0": pa.array(np.ones(len(c), np.int64)),
                "f1": pa.array(c),
                "f2": pa.array(c * c),
            }
        )
        return _sum_by(t, ["source"], ["f0", "f1", "f2"])

    agg = tree_merge(
        vocab.map_batches(fold, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["source"], ["f0", "f1", "f2"]),
    ).to_pandas()
    if not len(agg) or "source" not in agg.columns:
        return pa.table(
            {
                "source": pa.array([], pa.string()),
                "f0": pa.array([], pa.int64()),
                "f1": pa.array([], pa.int64()),
                "f2": pa.array([], pa.int64()),
                "surprise_x1e6": pa.array([], pa.int64()),
            }
        )
    agg = agg.sort_values("source", ignore_index=True)
    surp = [
        None
        if int(agg["f1"].iloc[i]) == 0
        else _round_half_away(
            float(int(agg["f2"].iloc[i])) / int(agg["f1"].iloc[i]) * 1e6
        )
        for i in range(len(agg))
    ]
    return pa.table(
        {
            "source": pa.array(agg["source"].tolist(), pa.string()),
            "f0": pa.array(agg["f0"].to_numpy(dtype=np.int64)),
            "f1": pa.array(agg["f1"].to_numpy(dtype=np.int64)),
            "f2": pa.array(agg["f2"].to_numpy(dtype=np.int64)),
            "surprise_x1e6": pa.array(surp, pa.int64()),
        }
    )


FREQ_MOMENTS_SQL = """
WITH w AS (
  SELECT source, unnest(string_split(lower(text), ' ')) AS w
  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL
), c AS (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
  FROM w GROUP BY 1, 2
), a AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS f0,
         CAST(SUM(c) AS BIGINT) AS f1,
         CAST(SUM(c * c) AS BIGINT) AS f2
  FROM c GROUP BY 1
)
SELECT source, f0, f1, f2,
       CASE WHEN f1 = 0 THEN NULL
            ELSE CAST(ROUND(CAST(f2 AS DOUBLE) / f1 * 1000000, 0)
                 AS BIGINT) END AS surprise_x1e6
FROM a ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Good-Turing adjusted counts r* from the frequency-of-frequencies
# ---------------------------------------------------------------------------


def q_good_turing_rstar(sf_dir):
    """Per source: the Good-Turing frequency-of-frequencies N1..N4 and
    the adjusted counts r* = (r+1) N_{r+1} / N_r for r = 1..3, plus
    the unseen-probability mass p0 = N1/F1 — the smoothing table that
    tells a language model how much probability the corpus has NOT
    seen. N_r are exact integer histogram cells over the vocabulary
    grain; r* and p0 are mirrored doubles, x1e6 snap, NULL where the
    denominator cell is empty."""
    vocab = _word_counts(sf_dir)

    def fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "source" not in b.column_names:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "f1": pa.array([], pa.int64()),
                    "n1": pa.array([], pa.int64()),
                    "n2": pa.array([], pa.int64()),
                    "n3": pa.array([], pa.int64()),
                    "n4": pa.array([], pa.int64()),
                }
            )
        c = b["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table(
            {
                "source": b["source"],
                "f1": pa.array(c),
                "n1": pa.array((c == 1).astype(np.int64)),
                "n2": pa.array((c == 2).astype(np.int64)),
                "n3": pa.array((c == 3).astype(np.int64)),
                "n4": pa.array((c == 4).astype(np.int64)),
            }
        )
        return _sum_by(t, ["source"], ["f1", "n1", "n2", "n3", "n4"])

    agg = tree_merge(
        vocab.map_batches(fold, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["source"], ["f1", "n1", "n2", "n3", "n4"]),
    ).to_pandas()
    cols = [
        "source", "n1", "n2", "n3", "n4",
        "p0_x1e6", "r1star_x1e6", "r2star_x1e6", "r3star_x1e6",
    ]
    if not len(agg) or "source" not in agg.columns:
        return pa.table(
            {
                "source": pa.array([], pa.string()),
                **{c: pa.array([], pa.int64()) for c in cols[1:]},
            }
        )
    agg = agg.sort_values("source", ignore_index=True)
    out = {c: [] for c in cols}
    for i in range(len(agg)):
        f1 = int(agg["f1"].iloc[i])
        n = [int(agg[f"n{r}"].iloc[i]) for r in (1, 2, 3, 4)]
        out["source"].append(agg["source"].iloc[i])
        for r in (1, 2, 3, 4):
            out.setdefault(f"n{r}", []).append(n[r - 1])
        out["p0_x1e6"].append(
            None if f1 == 0 else _round_half_away(float(n[0]) / f1 * 1e6)
        )
        for r in (1, 2, 3):
            out[f"r{r}star_x1e6"].append(
                None
                if n[r - 1] == 0
                else _round_half_away(
                    (r + 1.0) * n[r] / n[r - 1] * 1e6
                )
            )
    return pa.table(
        {
            "source": pa.array(out["source"], pa.string()),
            **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
        }
    )


GOOD_TURING_SQL = """
WITH w AS (
  SELECT source, unnest(string_split(lower(text), ' ')) AS w
  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL
), c AS (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
  FROM w GROUP BY 1, 2
), a AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS f1,
         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN c = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
         CAST(SUM(CASE WHEN c = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n4
  FROM c GROUP BY 1
)
SELECT source, n1, n2, n3, n4,
       CASE WHEN f1 = 0 THEN NULL
            ELSE CAST(ROUND(CAST(n1 AS DOUBLE) / f1 * 1000000, 0)
                 AS BIGINT) END AS p0_x1e6,
       CASE WHEN n1 = 0 THEN NULL
            ELSE CAST(ROUND(2.0 * n2 / n1 * 1000000, 0) AS BIGINT)
       END AS r1star_x1e6,
       CASE WHEN n2 = 0 THEN NULL
            ELSE CAST(ROUND(3.0 * n3 / n2 * 1000000, 0) AS BIGINT)
       END AS r2star_x1e6,
       CASE WHEN n3 = 0 THEN NULL
            ELSE CAST(ROUND(4.0 * n4 / n3 * 1000000, 0) AS BIGINT)
       END AS r3star_x1e6
FROM a ORDER BY 1
"""


# ---------------------------------------------------------------------------
# upper-tail joint exceedance index between event-type pairs
# ---------------------------------------------------------------------------


def q_tail_exceedance_type_pairs(sf_dir):
    """Per unordered event-type pair: the upper-tail joint exceedance
    index over hourly counts — P(both strictly above their own p75) /
    (P(a above) * P(b above)) on the hours BOTH types were observed
    (1 = tail independence, >1 = the types spike together; the co-
    incident-load signal capacity planning needs beyond correlation).
    Thresholds select by integer cross-multiplication inside the
    joined sample; exceedance counts are exact; the index is a
    mirrored double, x1e6 snap, NULL when either marginal never
    exceeds."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b["event_type"]), pc.is_valid(b["ts"]))
        b = b.filter(m)
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        h = (us // _HOUR_US).astype(np.int64)
        t = pa.table(
            {
                "event_type": b["event_type"],
                "h": pa.array(h),
                "c": pa.array(np.ones(len(h), np.int64)),
            }
        )
        return _sum_by(t, ["event_type", "h"], ["c"])

    hourly = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type", "h"], ["c"]),
    ).to_pandas()
    cols = ["type_a", "type_b", "n_hours", "n_both", "jei_x1e6"]
    if not len(hourly) or "event_type" not in hourly.columns:
        return pa.table(
            {
                "type_a": pa.array([], pa.string()),
                "type_b": pa.array([], pa.string()),
                "n_hours": pa.array([], pa.int64()),
                "n_both": pa.array([], pa.int64()),
                "jei_x1e6": pa.array([], pa.int64()),
            }
        )
    series = {
        et: dict(zip(g["h"].tolist(), g["c"].tolist()))
        for et, g in hourly.groupby("event_type", sort=True)
    }
    types = sorted(series)
    out = {c: [] for c in cols}
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            hs = sorted(set(series[ta]) & set(series[tb]))
            if not hs:
                continue
            ca = np.array([series[ta][h] for h in hs], np.int64)
            cb = np.array([series[tb][h] for h in hs], np.int64)
            n = len(hs)
            qa = int(np.sort(ca)[int(np.argmax(4 * (np.arange(n) + 1) >= 3 * n))])
            qb = int(np.sort(cb)[int(np.argmax(4 * (np.arange(n) + 1) >= 3 * n))])
            na = int(np.sum(ca > qa))
            nb = int(np.sum(cb > qb))
            nboth = int(np.sum((ca > qa) & (cb > qb)))
            jei = (
                None
                if na == 0 or nb == 0
                else float(nboth) * n / (float(na) * nb)
            )
            out["type_a"].append(ta)
            out["type_b"].append(tb)
            out["n_hours"].append(n)
            out["n_both"].append(nboth)
            out["jei_x1e6"].append(
                None if jei is None else _round_half_away(jei * 1e6)
            )
    return pa.table(
        {
            "type_a": pa.array(out["type_a"], pa.string()),
            "type_b": pa.array(out["type_b"], pa.string()),
            "n_hours": pa.array(out["n_hours"], pa.int64()),
            "n_both": pa.array(out["n_both"], pa.int64()),
            "jei_x1e6": pa.array(out["jei_x1e6"], pa.int64()),
        }
    )


TAIL_EXCEED_SQL = """
WITH hourly AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / 3600000000) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), j AS MATERIALIZED (
  SELECT a.event_type AS ta, b.event_type AS tb, a.h, a.c AS ca, b.c AS cb
  FROM hourly a JOIN hourly b
    ON a.h = b.h AND a.event_type < b.event_type
), q AS MATERIALIZED (
  SELECT ta, tb, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(PERCENTILE_DISC(0.75) WITHIN GROUP (ORDER BY ca) AS BIGINT)
           AS qa,
         CAST(PERCENTILE_DISC(0.75) WITHIN GROUP (ORDER BY cb) AS BIGINT)
           AS qb
  FROM j GROUP BY 1, 2
), f AS (
  SELECT j.ta, j.tb, q.n,
         CAST(SUM(CASE WHEN j.ca > q.qa THEN 1 ELSE 0 END) AS BIGINT)
           AS na,
         CAST(SUM(CASE WHEN j.cb > q.qb THEN 1 ELSE 0 END) AS BIGINT)
           AS nb,
         CAST(SUM(CASE WHEN j.ca > q.qa AND j.cb > q.qb THEN 1 ELSE 0 END)
              AS BIGINT) AS n_both
  FROM j JOIN q ON q.ta = j.ta AND q.tb = j.tb
  GROUP BY 1, 2, q.n
)
SELECT ta AS type_a, tb AS type_b, n AS n_hours, n_both,
       CASE WHEN na = 0 OR nb = 0 THEN NULL
            ELSE CAST(ROUND(CAST(n_both AS DOUBLE) * n
                 / (CAST(na AS DOUBLE) * nb) * 1000000, 0) AS BIGINT)
       END AS jei_x1e6
FROM f ORDER BY 1, 2
"""


def register_r4dx(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "frequency_moments_words": q_frequency_moments_words,
            "good_turing_rstar": q_good_turing_rstar,
            "tail_exceedance_type_pairs": q_tail_exceedance_type_pairs,
        }
    )
    oracles.update(
        {
            "frequency_moments_words": FREQ_MOMENTS_SQL,
            "good_turing_rstar": GOOD_TURING_SQL,
            "tail_exceedance_type_pairs": TAIL_EXCEED_SQL,
        }
    )

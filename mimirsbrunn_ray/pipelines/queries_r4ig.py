"""Round-4 batch IG: phonotactic fingerprints, naming-tail
concentration, and the calendar's first four weeks — the vowel
ratio by language (vowels per letter — a zero-model language
discriminator), the part-name last-word top-5 (how concentrated
is the trailing vocabulary of catalog names), and the
day-of-month uniformity test (chi-square over days 1–28, every
month contributes all 28 — is demand flat within the month or
front-loaded at the 1st?).

Exactness discipline: all counts are exact integers folded
distributed; ratios snap at ppm; top-k ties break
lexicographically on both sides."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _round_half_away,
)
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_VRL_COLS = ["lang", "n_letters", "vowel_ppm"]


def q_vowel_ratio_by_lang(sf_dir):
    """The zero-model language discriminator: per language tag,
    vowels (aeiou, either case) per Latin letter — Italian and
    Finnish run vowel-heavy, Czech consonant-heavy; a corpus
    whose tag disagrees with its vowel ratio is mislabeled.
    Per-row regex counts fold exactly."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "text"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("lang", "text"))
        if b.num_rows == 0:
            return pa.table({
                "lang": pa.array([], pa.string()),
                "letters": pa.array([], pa.int64()),
                "vowels": pa.array([], pa.int64()),
            })
        letters = pc.count_substring_regex(
            b["text"], "[A-Za-z]").to_numpy(
            zero_copy_only=False).astype(np.int64)
        vowels = pc.count_substring_regex(
            b["text"], "[aeiouAEIOU]").to_numpy(
            zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({
            "lang": np.asarray(
                b["lang"].to_numpy(zero_copy_only=False)),
            "letters": letters, "vowels": vowels,
        })
        agg = df.groupby("lang").sum().reset_index()
        for c in ["letters", "vowels"]:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["lang"]).aggregate(
            [("letters", "sum"), ("vowels", "sum")])
        return g.rename_columns(["lang", "letters", "vowels"])

    cc = tree_merge(
        docs.map_batches(part, batch_format="pyarrow",
                         batch_size=None),
        comb,
    ).to_pandas()
    if "lang" not in cc.columns or len(cc) == 0:
        return pa.table({
            "lang": pa.array([], pa.string()),
            "n_letters": pa.array([], pa.int64()),
            "vowel_ppm": pa.array([], pa.int64()),
        })
    cc = cc[cc["letters"] > 0].sort_values("lang")
    return pa.table({
        "lang": pa.array(cc["lang"], pa.string()),
        "n_letters": pa.array(
            cc["letters"].to_numpy(np.int64), pa.int64()),
        "vowel_ppm": pa.array(
            [_round_half_away(v / l * 1e6)
             for v, l in zip(cc["vowels"], cc["letters"])],
            pa.int64()),
    })


VRL_SQL = """
WITH vc AS MATERIALIZED (
  SELECT lang,
         CAST(SUM(LENGTH(REGEXP_REPLACE(text, '[^A-Za-z]', '',
                                        'g'))) AS BIGINT)
           AS letters,
         CAST(SUM(LENGTH(REGEXP_REPLACE(text, '[^aeiouAEIOU]',
                                        '', 'g'))) AS BIGINT)
           AS vowels
  FROM documents
  WHERE lang IS NOT NULL AND text IS NOT NULL
  GROUP BY 1
)
SELECT lang, letters AS n_letters,
       CAST(ROUND(CAST(vowels AS DOUBLE) / letters
            * 1000000, 0) AS BIGINT) AS vowel_ppm
FROM vc
WHERE letters > 0
ORDER BY lang
"""

_PLW_COLS = ["rank", "last_word", "n_parts", "share_ppm"]


def q_pname_last_word_topk(sf_dir):
    """The trailing vocabulary of the catalog: the five most
    common LAST words of part names with their share of all
    parts — a heavy head here means search suffixes and SKU
    slugs collide constantly.  Word counts fold exactly; ranks
    break ties lexicographically."""
    parts = rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_name"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["p_name"]))
        if b.num_rows == 0:
            return pa.table({
                "w": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            })
        words = pc.split_pattern(b["p_name"], " ")
        wl = words.to_pylist()
        last = pa.array([w[-1] for w in wl], pa.string())
        t = pa.table({
            "w": last,
            "n": pa.array(np.ones(b.num_rows, np.int64)),
        })
        g = t.group_by(["w"]).aggregate([("n", "sum")])
        return g.rename_columns(["w", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["w"]).aggregate([("n", "sum")])
        return g.rename_columns(["w", "n"])

    wc = tree_merge(
        parts.map_batches(part, batch_format="pyarrow",
                          batch_size=None),
        comb,
    ).to_pandas()
    if "w" not in wc.columns or len(wc) == 0:
        return pa.table({
            "rank": pa.array([], pa.int64()),
            "last_word": pa.array([], pa.string()),
            "n_parts": pa.array([], pa.int64()),
            "share_ppm": pa.array([], pa.int64()),
        })
    tot = int(wc["n"].sum())
    wc = wc.sort_values(["n", "w"],
                        ascending=[False, True]).head(5)
    return pa.table({
        "rank": pa.array(range(1, len(wc) + 1), pa.int64()),
        "last_word": pa.array(wc["w"], pa.string()),
        "n_parts": pa.array(
            wc["n"].to_numpy(np.int64), pa.int64()),
        "share_ppm": pa.array(
            [_round_half_away(n / tot * 1e6) for n in wc["n"]],
            pa.int64()),
    })


PLW_SQL = """
WITH lw AS MATERIALIZED (
  SELECT STRING_SPLIT(p_name, ' ')[LEN(STRING_SPLIT(
             p_name, ' '))] AS w,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM part WHERE p_name IS NOT NULL
  GROUP BY 1
), tot AS MATERIALIZED (
  SELECT CAST(SUM(n) AS BIGINT) AS t FROM lw
), top AS MATERIALIZED (
  SELECT w, n,
         ROW_NUMBER() OVER (ORDER BY n DESC, w ASC) AS rank
  FROM lw
  QUALIFY rank <= 5
)
SELECT CAST(top.rank AS BIGINT) AS rank,
       top.w AS last_word,
       top.n AS n_parts,
       CAST(ROUND(CAST(top.n AS DOUBLE) / tot.t * 1000000, 0)
            AS BIGINT) AS share_ppm
FROM top CROSS JOIN tot
ORDER BY top.rank
"""

_DMU_COLS = ["n_orders_d28", "chi2_x1e3", "max_dom",
             "max_share_ppm"]


def q_day_of_month_uniformity(sf_dir):
    """Is demand flat within the month?  A chi-square of order
    counts over days 1–28 (every month has all 28, so uniform is
    the honest null) plus the hottest day — payday and
    1st-of-month effects light up here.  Day-of-month counts
    fold exactly; the peak breaks ties on the smallest day."""
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderdate"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["o_orderdate"]))
        if b.num_rows == 0:
            return pa.table({
                "dom": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        d = b["o_orderdate"].cast(pa.timestamp("us")).to_pandas()
        dom = d.dt.day.to_numpy(np.int64)
        keep = dom <= 28
        dom = dom[keep]
        t = pa.table({
            "dom": pa.array(dom),
            "n": pa.array(np.ones(len(dom), np.int64)),
        })
        g = t.group_by(["dom"]).aggregate([("n", "sum")])
        return g.rename_columns(["dom", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["dom"]).aggregate([("n", "sum")])
        return g.rename_columns(["dom", "n"])

    cc = tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None),
        comb,
    ).to_pandas()
    if "dom" not in cc.columns or len(cc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _DMU_COLS})
    full = np.zeros(28, np.int64)
    for _, r in cc.iterrows():
        full[int(r["dom"]) - 1] = int(r["n"])
    tot = int(full.sum())
    if tot == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _DMU_COLS})
    exp = tot / 28.0
    chi2 = float((((full - exp) ** 2) / exp).sum())
    return pa.table({
        "n_orders_d28": pa.array([tot], pa.int64()),
        "chi2_x1e3": pa.array(
            [_round_half_away(chi2 * 1e3)], pa.int64()),
        "max_dom": pa.array(
            [int(np.argmax(full)) + 1], pa.int64()),
        "max_share_ppm": pa.array(
            [_round_half_away(int(full.max()) / tot * 1e6)],
            pa.int64()),
    })


DMU_SQL = """
WITH RECURSIVE dc AS MATERIALIZED (
  SELECT CAST(DAY(o_orderdate) AS BIGINT) AS dom,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders
  WHERE o_orderdate IS NOT NULL AND DAY(o_orderdate) <= 28
  GROUP BY 1
), doms AS (
  SELECT CAST(1 AS BIGINT) AS dom
  UNION ALL
  SELECT dom + 1 FROM doms WHERE dom + 1 <= 28
), fl AS MATERIALIZED (
  SELECT doms.dom, COALESCE(dc.n, 0) AS n
  FROM doms LEFT JOIN dc USING (dom)
), tot AS MATERIALIZED (
  SELECT CAST(SUM(n) AS BIGINT) AS t FROM fl
), chi AS MATERIALIZED (
  SELECT SUM((n - tot.t / 28.0) * (n - tot.t / 28.0)
             / (tot.t / 28.0)) AS chi2
  FROM fl CROSS JOIN tot
), pk AS MATERIALIZED (
  SELECT dom, n FROM fl ORDER BY n DESC, dom ASC LIMIT 1
)
SELECT tot.t AS n_orders_d28,
       CAST(ROUND(chi.chi2 * 1000, 0) AS BIGINT) AS chi2_x1e3,
       pk.dom AS max_dom,
       CAST(ROUND(CAST(pk.n AS DOUBLE) / tot.t * 1000000, 0)
            AS BIGINT) AS max_share_ppm
FROM tot CROSS JOIN chi CROSS JOIN pk
WHERE tot.t > 0
"""


def register_r4ig(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "vowel_ratio_by_lang": q_vowel_ratio_by_lang,
            "pname_last_word_topk": q_pname_last_word_topk,
            "day_of_month_uniformity":
                q_day_of_month_uniformity,
        }
    )
    oracles.update(
        {
            "vowel_ratio_by_lang": VRL_SQL,
            "pname_last_word_topk": PLW_SQL,
            "day_of_month_uniformity": DMU_SQL,
        }
    )

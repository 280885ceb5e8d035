"""Round-4 extension queries: distribution/robust-stats windows, corpus
divergence, path mining, and two more TPC-H join-aggregate shapes.

Every query here follows the repo's exactness discipline (SURVEY.md §6):
float outputs are produced from INTEGER-exact decomposable sums (cents /
x1e12 fixed point) or from order statistics that are actual data
elements, with the final float formula written with the SAME expression
tree as the DuckDB oracle — so the driver's zero-tolerance compare
(rows + schema + value hash) passes bit-for-bit.

Reference parity notes: the per-source distribution queries generalize
the reference's per-key import stats (A4,
/root/reference/libs/mimir/src/rubber.rs:413-452 counters) into exact
distribution shape descriptors; the path/divergence queries are
beyond-reference LLM-curation operators (data mixing / drift detection).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# ---------------------------------------------------------------------------
# shared: per-(source, n_chars) histogram — ONE decomposable pass whose
# combine state is bounded by |sources| x |distinct lengths|, never rows.
# ---------------------------------------------------------------------------


def _source_chars_hist(sf_dir: str) -> "rd.Dataset":
    from mimirsbrunn_ray.stages.rollup import tree_merge

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
    )

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {"source": b["source"], "x": b["n_chars"].cast(pa.int64())}
        )
        # SQL twins exclude NULL keys/values (aggregates ignore NULLs;
        # a null histogram bin would shift every rank)
        t = t.filter(
            pc.and_(pc.is_valid(t["source"]), pc.is_valid(t["x"]))
        )
        g = t.group_by(["source", "x"]).aggregate([([], "count_all")])
        g = g.select(["source", "x", "count_all"])
        return g.rename_columns(["source", "x", "c"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["source", "x"]).aggregate([("c", "sum")])
        g = g.select(["source", "x", "c_sum"])
        return g.rename_columns(["source", "x", "c"])

    return tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    )


def _hist_blocks(hist: "rd.Dataset"):
    """tree_merge converges to ONE bounded block; yield (source, vals,
    counts) with vals ascending."""
    parts = list(hist.iter_batches(batch_format="pyarrow"))
    if not parts:
        return
    import pandas as pd  # noqa: F401 — sorted segment walk below

    t = pa.concat_tables(parts)
    df = t.to_pandas().sort_values(["source", "x"], ignore_index=True)
    for src, g in df.groupby("source", sort=True):
        yield str(src), g["x"].to_numpy(np.int64), g["c"].to_numpy(np.int64)


# ---------------------------------------------------------------------------
# NTILE(4) distribution tiles per source
# ---------------------------------------------------------------------------


def q_ntile_doc_lengths(sf_dir):
    """NTILE(4) OVER (PARTITION BY source ORDER BY n_chars, doc_id),
    aggregated per (source, tile) — quartile tiles of the document-length
    distribution WITHOUT a sort shuffle: the per-(source, length)
    histogram is decomposable, and NTILE boundaries are pure rank
    arithmetic walked on the bounded final block (SQL-standard sizing:
    the first n%k tiles get ceil(n/k) rows). The doc_id tiebreak never
    changes per-tile min/max because rows straddling a boundary share the
    same n_chars."""
    rows = {"source": [], "tile": [], "n_docs": [], "min_chars": [],
            "max_chars": []}
    k = 4
    for src, vals, counts in _hist_blocks(_source_chars_hist(sf_dir)):
        cum = np.cumsum(counts)
        n = int(cum[-1])
        q, r = divmod(n, k)
        end = 0
        for t in range(1, k + 1):
            size = q + 1 if t <= r else q
            if size == 0:
                continue
            lo_rank, hi_rank = end + 1, end + size
            end += size
            lo_v = int(vals[np.searchsorted(cum, lo_rank, side="left")])
            hi_v = int(vals[np.searchsorted(cum, hi_rank, side="left")])
            rows["source"].append(src)
            rows["tile"].append(t)
            rows["n_docs"].append(size)
            rows["min_chars"].append(lo_v)
            rows["max_chars"].append(hi_v)
    return pa.table(
        {
            "source": pa.array(rows["source"], pa.string()),
            "tile": pa.array(rows["tile"], pa.int64()),
            "n_docs": pa.array(rows["n_docs"], pa.int64()),
            "min_chars": pa.array(rows["min_chars"], pa.int64()),
            "max_chars": pa.array(rows["max_chars"], pa.int64()),
        }
    )


NTILE_SQL = """
WITH t AS (
  SELECT source, n_chars,
         NTILE(4) OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS tile
  FROM documents WHERE source IS NOT NULL AND n_chars IS NOT NULL
)
SELECT source, CAST(tile AS BIGINT) AS tile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM t GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Gini concentration of document lengths per source
# ---------------------------------------------------------------------------


def q_gini_doc_lengths(sf_dir):
    """Per-source GINI COEFFICIENT of n_chars (corpus length-inequality —
    a data-mixing diagnostic): G = 2*S/(n*T) - (n+1)/n with
    S = sum(i * x_(i)) over ascending ranks. Runs of equal values
    contribute x * (c*(2*hi - c + 1))/2 (hi = inclusive cumulative
    count), so S comes INTEGER-exact off the same bounded histogram as
    the NTILE query — no sort, no float accumulation; only the final
    formula is float, mirrored verbatim in the SQL twin."""
    rows = {"source": [], "gini": []}
    for src, vals, counts in _hist_blocks(_source_chars_hist(sf_dir)):
        hi = np.cumsum(counts)
        s = int(np.sum(vals * ((counts * (2 * hi - counts + 1)) // 2)))
        t = int(np.sum(vals * counts))
        n = int(hi[-1])
        gini = (2 * float(s)) / (float(n) * float(t)) - (
            float(n) + 1
        ) / float(n)
        rows["source"].append(src)
        rows["gini"].append(gini)
    return pa.table(
        {
            "source": pa.array(rows["source"], pa.string()),
            "gini": pa.array(rows["gini"], pa.float64()),
        }
    )


GINI_SQL = """
WITH h AS (
  SELECT source, CAST(n_chars AS BIGINT) AS x, COUNT(*) AS c
  FROM documents WHERE source IS NOT NULL AND n_chars IS NOT NULL
  GROUP BY 1, 2
),
o AS (
  SELECT source, x, c,
         SUM(c) OVER (PARTITION BY source ORDER BY x) AS hi
  FROM h
),
a AS (
  SELECT source,
         SUM(x * ((c * (2*hi - c + 1)) // 2)) AS s,
         SUM(x * c) AS t, SUM(c) AS n
  FROM o GROUP BY 1
)
SELECT source,
       (2*CAST(s AS DOUBLE)) / (CAST(n AS DOUBLE)*CAST(t AS DOUBLE))
         - (CAST(n AS DOUBLE)+1)/CAST(n AS DOUBLE) AS gini
FROM a
"""


# ---------------------------------------------------------------------------
# Median / MAD robust outlier flagging per event type
# ---------------------------------------------------------------------------


def _qcont(vals: np.ndarray, cum: np.ndarray, q: float) -> float:
    """PERCENTILE_CONT over a sorted value histogram, DuckDB's exact
    operation order (crn-rn)*lo + (rn-frn)*hi (see
    stages/rollup.exact_continuous_quantile)."""
    n = int(cum[-1])
    rn = (n - 1) * q
    frn, crn = math.floor(rn), math.ceil(rn)
    lo = float(vals[np.searchsorted(cum, frn + 1, side="left")])
    if frn == crn:
        return lo
    hi = float(vals[np.searchsorted(cum, crn + 1, side="left")])
    return (crn - rn) * lo + (rn - frn) * hi


def q_mad_outlier_events(sf_dir):
    """Robust MEDIAN / MAD outlier screen per event type (the
    median-absolute-deviation rule |v - med| > 3*MAD): ONE decomposable
    pass builds a per-(type, cents) histogram — bounded by types x
    distinct cents, never rows — and median, MAD, AND the outlier count
    all fall out of the histogram on the driver (the deviation histogram
    is a fold of the value histogram around the median, so no second
    data pass). Matches DuckDB's quantile_cont interpolation bit-exactly
    because deviations are exact multiples of 0.5 cents."""
    from mimirsbrunn_ray.stages.rollup import tree_merge

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b["event_type"]), pc.is_valid(b["value"]))
        b = b.filter(m)
        vc = pc.cast(
            pc.round(
                pc.multiply(b["value"].cast(pa.float64()), 100.0),
                ndigits=0, round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        t = pa.table({"event_type": b["event_type"], "vc": vc})
        g = t.group_by(["event_type", "vc"]).aggregate([([], "count_all")])
        g = g.select(["event_type", "vc", "count_all"])
        return g.rename_columns(["event_type", "vc", "c"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "vc"]).aggregate([("c", "sum")])
        g = g.select(["event_type", "vc", "c_sum"])
        return g.rename_columns(["event_type", "vc", "c"])

    hist = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    )
    parts = list(hist.iter_batches(batch_format="pyarrow"))
    out = {"event_type": [], "med": [], "mad": [], "n_outliers": [], "n": []}
    if parts:
        df = pa.concat_tables(parts).to_pandas().sort_values(
            ["event_type", "vc"], ignore_index=True
        )
        for et, g in df.groupby("event_type", sort=True):
            vals = g["vc"].to_numpy(np.int64)
            counts = g["c"].to_numpy(np.int64)
            cum = np.cumsum(counts)
            med = _qcont(vals, cum, 0.5)
            dev = np.abs(vals.astype(np.float64) - med)
            order = np.argsort(dev, kind="stable")
            dvals, dcnt = dev[order], counts[order]
            # merge duplicate deviations (values mirrored around med)
            uniq, inv = np.unique(dvals, return_inverse=True)
            dsum = np.zeros(len(uniq), np.int64)
            np.add.at(dsum, inv, dcnt)
            dcum = np.cumsum(dsum)
            mad = _qcont(uniq, dcum, 0.5)
            n_out = int(dsum[uniq > 3 * mad].sum())
            out["event_type"].append(str(et))
            out["med"].append(med)
            out["mad"].append(mad)
            out["n_outliers"].append(n_out)
            out["n"].append(int(cum[-1]))
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "med": pa.array(out["med"], pa.float64()),
            "mad": pa.array(out["mad"], pa.float64()),
            "n_outliers": pa.array(out["n_outliers"], pa.int64()),
            "n": pa.array(out["n"], pa.int64()),
        }
    )


MAD_SQL = """
WITH v AS (
  SELECT event_type, CAST(ROUND(value*100, 0) AS BIGINT) AS vc
  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
),
m AS (SELECT event_type, quantile_cont(vc, 0.5) AS med FROM v GROUP BY 1),
d AS (
  SELECT v.event_type, ABS(v.vc - m.med) AS dev
  FROM v JOIN m USING (event_type)
),
s AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad FROM d GROUP BY 1)
SELECT d.event_type, m.med, s.mad,
       CAST(SUM(CASE WHEN d.dev > 3*s.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers,
       CAST(COUNT(*) AS BIGINT) AS n
FROM d JOIN m USING (event_type) JOIN s USING (event_type)
GROUP BY d.event_type, m.med, s.mad
"""


# ---------------------------------------------------------------------------
# Jensen-Shannon drift of each source's unigram distribution vs the corpus
# ---------------------------------------------------------------------------


def q_js_divergence_sources(sf_dir):
    """Per-source JENSEN-SHANNON divergence between the source's unigram
    word distribution and the whole-corpus distribution — corpus drift /
    mixing diagnostic (cf. CCNet-style corpus scoring; beyond-reference).

    Exactness: words absent from a source contribute q*ln2 to the
    q-side KL, so JS folds to a SPARSE sum over (source, word) pairs
    plus the closed-form 0.5*ln2 constant:
      JS = sum_w-in-s [0.5*(p ln(p/m) + q ln(q/m)) - 0.5*ln2*q] + 0.5*ln2
    Each term is snapped to x1e12 fixed point (half-away, DuckDB ROUND
    parity) so the cross-engine SUM is an exact integer; logs use
    math.log (libm), which matches DuckDB's LN bit-for-bit where
    numpy's SIMD log does not."""
    from mimirsbrunn_ray.stages.ordered import _round_half_away
    from mimirsbrunn_ray.stages.rollup import tree_merge

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["source"]))
        ws = pc.split_pattern(
            pc.utf8_lower(pc.fill_null(b["text"], "")), " "
        )
        idx = pc.list_parent_indices(ws)
        t = pa.table(
            {
                "source": pc.take(b["source"], idx),
                "word": pc.list_flatten(ws),
            }
        )
        g = t.group_by(["source", "word"]).aggregate([([], "count_all")])
        g = g.select(["source", "word", "count_all"])
        return g.rename_columns(["source", "word", "c"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["source", "word"]).aggregate([("c", "sum")])
        g = g.select(["source", "word", "c_sum"])
        return g.rename_columns(["source", "word", "c"])

    merged = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    )
    parts = list(merged.iter_batches(batch_format="pyarrow"))
    ln2 = math.log(2.0)
    if not parts:
        return pa.table(
            {"source": pa.array([], pa.string()),
             "js": pa.array([], pa.float64())}
        )
    df = pa.concat_tables(parts).to_pandas()
    c = df["c"].to_numpy(np.int64)
    n_s = df.groupby("source")["c"].transform("sum").to_numpy(np.int64)
    cg = df.groupby("word")["c"].transform("sum").to_numpy(np.int64)
    nn = int(c.sum())
    p = c.astype(np.float64) / n_s.astype(np.float64)
    q = cg.astype(np.float64) / float(nn)
    m2 = (p + q) * 0.5
    log = math.log  # libm — DuckDB LN parity (np.log differs in the ulp)
    lp = np.fromiter((log(v) for v in p / m2), np.float64, len(p))
    lq = np.fromiter((log(v) for v in q / m2), np.float64, len(q))
    term = 0.5 * (p * lp + q * lq) - (0.5 * ln2) * q
    ti = _round_half_away(term * 1e12).astype(np.int64)
    agg = (
        df.assign(ti=ti).groupby("source", sort=True)["ti"].sum()
    )
    js = agg.to_numpy(np.int64).astype(np.float64) / 1e12 + 0.5 * ln2
    return pa.table(
        {
            "source": pa.array([str(s) for s in agg.index], pa.string()),
            "js": pa.array(js, pa.float64()),
        }
    )


JS_SQL = """
WITH w AS (
  SELECT source,
         unnest(string_split(COALESCE(lower(text), ''), ' ')) AS word
  FROM documents WHERE source IS NOT NULL
),
c AS (SELECT source, word, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY 1, 2),
ns AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM c GROUP BY 1),
g AS (SELECT word, CAST(SUM(c) AS BIGINT) AS cg FROM c GROUP BY 1),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS nn FROM c),
pq AS (
  SELECT c.source,
         CAST(c.c AS DOUBLE)/CAST(ns.n AS DOUBLE) AS p,
         CAST(g.cg AS DOUBLE)/CAST(tot.nn AS DOUBLE) AS q
  FROM c JOIN ns USING (source) JOIN g USING (word) CROSS JOIN tot
),
t AS (
  SELECT source,
         CAST(ROUND((0.5*(p*LN(p/((p+q)*0.5)) + q*LN(q/((p+q)*0.5)))
                     - 0.5*LN(2)*q) * 1e12, 0) AS BIGINT) AS ti
  FROM pq
)
SELECT source, CAST(SUM(ti) AS DOUBLE)/1e12 + 0.5*LN(2) AS js
FROM t GROUP BY source
"""


# ---------------------------------------------------------------------------
# Regex extraction counts (numeric mentions) per source
# ---------------------------------------------------------------------------


def q_numeric_mentions(sf_dir):
    """Vectorized REGEX EXTRACTION counting per source
    (pc.count_substring_regex — RE2, same engine family as DuckDB's
    regexp_extract_all): how many numeric mentions each source carries
    and how many documents contain at least one. Decomposable sums; the
    scalar-function analog of the reference's zip/id normalizers (M14,
    /root/reference/libs/mimir/src/objects.rs:332-356)."""
    from mimirsbrunn_ray.stages.rollup import tree_merge

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["source"]))
        k = pc.count_substring_regex(
            pc.fill_null(b["text"], ""), "[0-9]+"
        ).cast(pa.int64())
        t = pa.table(
            {
                "source": b["source"],
                "k": k,
                "has": pc.cast(pc.greater(k, 0), pa.int64()),
            }
        )
        g = t.group_by(["source"]).aggregate(
            [("k", "sum"), ("has", "sum"), ([], "count_all")]
        )
        g = g.select(["source", "k_sum", "has_sum", "count_all"])
        return g.rename_columns(
            ["source", "n_matches", "n_docs_with", "n_docs"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["source"]).aggregate(
            [("n_matches", "sum"), ("n_docs_with", "sum"), ("n_docs", "sum")]
        )
        g = g.select(
            ["source", "n_matches_sum", "n_docs_with_sum", "n_docs_sum"]
        )
        return g.rename_columns(
            ["source", "n_matches", "n_docs_with", "n_docs"]
        )

    return tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    )


NUMERIC_SQL = """
WITH d AS (
  SELECT source,
         length(regexp_extract_all(COALESCE(text, ''), '[0-9]+')) AS k
  FROM documents WHERE source IS NOT NULL
)
SELECT source, CAST(SUM(k) AS BIGINT) AS n_matches,
       CAST(SUM(CASE WHEN k > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_with,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM d GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Frequent user journey prefixes (ordered STRING_AGG paths)
# ---------------------------------------------------------------------------


def q_user_event_paths(sf_dir):
    """Frequent USER JOURNEY prefixes: each user's first 5 events by
    (ts, event_id) joined into an ordered 'a>b>c' path string, then the
    20 most common paths. The ordered-STRING_AGG analog of the lead/lag
    family: grouped_top_k's partial prune moves <= 5 rows per (user,
    batch) into ONE coarse-bucket shuffle; path assembly runs per bucket
    block (complete user groups by construction), and path frequency is
    a bounded second rollup (paths <= |event_types|^5)."""
    from mimirsbrunn_ray.stages.rollup import tree_merge
    from mimirsbrunn_ray.stages.search import grouped_top_k

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def clean(b: pa.Table) -> pa.Table:
        return b.filter(
            pc.and_(
                pc.and_(
                    pc.is_valid(b["user_id"]), pc.is_valid(b["event_type"])
                ),
                pc.is_valid(b["ts"]),
            )
        )

    first5 = grouped_top_k(
        ev.map_batches(clean, batch_format="pyarrow", batch_size=None),
        ["user_id"], "ts", k=5, descending=False,
        tiebreak_cols=("event_id",), num_buckets=64,
    )

    def paths(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(
            ["user_id", "ts", "event_id"], ignore_index=True
        )
        p = df.groupby("user_id", sort=False)["event_type"].agg(">".join)
        t = pa.table({"path": pa.array(p.to_numpy(object), pa.string())})
        g = t.group_by(["path"]).aggregate([([], "count_all")])
        return g.select(["path", "count_all"]).rename_columns(
            ["path", "n_users"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["path"]).aggregate([("n_users", "sum")])
        return g.select(["path", "n_users_sum"]).rename_columns(
            ["path", "n_users"]
        )

    freq = tree_merge(
        first5.map_batches(paths, batch_format="pyarrow", batch_size=None),
        combine,
    )
    parts = list(freq.iter_batches(batch_format="pyarrow"))
    t = (
        pa.concat_tables(parts)
        if parts
        else pa.table(
            {"path": pa.array([], pa.string()),
             "n_users": pa.array([], pa.int64())}
        )
    )
    order = pc.sort_indices(
        t,
        sort_keys=[("n_users", "descending"), ("path", "ascending")],
    )
    t = t.take(order[:20])
    return t.set_column(
        1, "n_users", t["n_users"].cast(pa.int64())
    )


PATHS_SQL = """
WITH r AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL AND ts IS NOT NULL
),
p AS (
  SELECT user_id, STRING_AGG(event_type, '>' ORDER BY rn) AS path
  FROM r WHERE rn <= 5 GROUP BY user_id
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
FROM p GROUP BY path
ORDER BY n_users DESC, path
LIMIT 20
"""


def register_ext(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "ntile_doc_lengths": q_ntile_doc_lengths,
            "gini_doc_lengths": q_gini_doc_lengths,
            "mad_outlier_events": q_mad_outlier_events,
            "js_divergence_sources": q_js_divergence_sources,
            "numeric_mentions": q_numeric_mentions,
            "user_event_paths": q_user_event_paths,
        }
    )
    oracles.update(
        {
            "ntile_doc_lengths": NTILE_SQL,
            "gini_doc_lengths": GINI_SQL,
            "mad_outlier_events": MAD_SQL,
            "js_divergence_sources": JS_SQL,
            "numeric_mentions": NUMERIC_SQL,
            "user_event_paths": PATHS_SQL,
        }
    )

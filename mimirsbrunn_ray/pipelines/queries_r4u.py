"""Round-4 batch U: PII-adjacent mention counts (emails / URLs),
k-anonymity small-group audit, and equi-depth range-partition
boundaries.

Exactness discipline: RE2 patterns evaluated identically by Arrow and
DuckDB; group sizes and boundary picks are exact integers
(PERCENTILE_DISC semantics for the boundaries — actual data values, the
ones a range partitioner would ship).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

# shared RE2 literals — embedded in BOTH engines verbatim
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_URL_RE = r"https?://[^\s]+"


def _not_null(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# email / URL mention counts per source (the redaction pre-audit)
# ---------------------------------------------------------------------------


def q_email_url_mentions(sf_dir):
    """Per source: document count, documents containing at least one
    email / URL, and total mention counts — the audit a PII-redaction
    pass publishes BEFORE rewriting anything (stages/text.py redaction
    is the rewrite side). One stateless vectorized RE2 pass per batch
    (count_substring_regex), sources-bounded tree merge."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["source"]))
        text = pc.fill_null(b["text"], "")
        em = pc.count_substring_regex(text, _EMAIL_RE).cast(pa.int64())
        ur = pc.count_substring_regex(text, _URL_RE).cast(pa.int64())
        em_np = em.to_numpy(zero_copy_only=False)
        ur_np = ur.to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "source": b["source"],
                "one": pa.array(np.ones(len(b), dtype=np.int64)),
                "d_em": pa.array((em_np > 0).astype(np.int64)),
                "d_ur": pa.array((ur_np > 0).astype(np.int64)),
                "n_em": em,
                "n_ur": ur,
            }
        )
        g = t.group_by(["source"]).aggregate(
            [("one", "sum"), ("d_em", "sum"), ("d_ur", "sum"),
             ("n_em", "sum"), ("n_ur", "sum")]
        )
        g = g.select(
            ["source", "one_sum", "d_em_sum", "d_ur_sum", "n_em_sum",
             "n_ur_sum"]
        )
        return g.rename_columns(
            ["source", "n_docs", "docs_with_email", "docs_with_url",
             "n_emails", "n_urls"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["source"]).aggregate(
            [("n_docs", "sum"), ("docs_with_email", "sum"),
             ("docs_with_url", "sum"), ("n_emails", "sum"),
             ("n_urls", "sum")]
        )
        g = g.select(
            ["source", "n_docs_sum", "docs_with_email_sum",
             "docs_with_url_sum", "n_emails_sum", "n_urls_sum"]
        )
        return g.rename_columns(
            ["source", "n_docs", "docs_with_email", "docs_with_url",
             "n_emails", "n_urls"]
        )

    out = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    )

    def finish(b: pa.Table) -> pa.Table:
        cols = {"source": b["source"]}
        for c in ("n_docs", "docs_with_email", "docs_with_url",
                  "n_emails", "n_urls"):
            cols[c] = b[c].cast(pa.int64())
        return pa.table(cols)

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


MENTIONS_SQL = f"""
WITH d AS (
  SELECT source,
         len(regexp_extract_all(COALESCE(text, ''),
             '{_EMAIL_RE}')) AS n_em,
         len(regexp_extract_all(COALESCE(text, ''),
             '{_URL_RE}')) AS n_ur
  FROM documents WHERE source IS NOT NULL
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_em > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_with_email,
       CAST(SUM(CASE WHEN n_ur > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_with_url,
       CAST(SUM(n_em) AS BIGINT) AS n_emails,
       CAST(SUM(n_ur) AS BIGINT) AS n_urls
FROM d GROUP BY 1
"""


# ---------------------------------------------------------------------------
# k-anonymity small-group audit over (source, lang)
# ---------------------------------------------------------------------------

_KANON = 5


def q_small_group_docs(sf_dir):
    """K-anonymity audit over the (source, lang) quasi-identifier: per
    source, how many of its (source, lang) cells hold FEWER than 5
    documents and how many documents sit in those small cells — the
    re-identification risk readout a release review wants. Cell counts
    are a bounded combiner-first tier; the audit is one vectorized pass
    over that tier."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "lang"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("source", "lang"))
        g = b.group_by(["source", "lang"]).aggregate([([], "count_all")])
        return g.select(["source", "lang", "count_all"]).rename_columns(
            ["source", "lang", "c"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["source", "lang"]).aggregate([("c", "sum")])
        return g.select(["source", "lang", "c_sum"]).rename_columns(
            ["source", "lang", "c"]
        )

    cells = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
        final_shards=8,
        shard_cols=["source", "lang"],
    )

    def audit(b: pa.Table) -> pa.Table:
        c = b["c"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        small = (c < _KANON).astype(np.int64)
        t = pa.table(
            {
                "source": b["source"],
                "one": pa.array(np.ones(len(c), dtype=np.int64)),
                "sc": pa.array(small),
                "sd": pa.array(np.where(small == 1, c, 0)),
                "nd": pa.array(c),
            }
        )
        g = t.group_by(["source"]).aggregate(
            [("one", "sum"), ("sc", "sum"), ("sd", "sum"), ("nd", "sum")]
        )
        g = g.select(["source", "one_sum", "sc_sum", "sd_sum", "nd_sum"])
        return g.rename_columns(
            ["source", "n_cells", "n_small_cells", "n_docs_small",
             "n_docs"]
        )

    def combine_a(b: pa.Table) -> pa.Table:
        g = b.group_by(["source"]).aggregate(
            [("n_cells", "sum"), ("n_small_cells", "sum"),
             ("n_docs_small", "sum"), ("n_docs", "sum")]
        )
        g = g.select(
            ["source", "n_cells_sum", "n_small_cells_sum",
             "n_docs_small_sum", "n_docs_sum"]
        )
        return g.rename_columns(
            ["source", "n_cells", "n_small_cells", "n_docs_small",
             "n_docs"]
        )

    out = tree_merge(
        cells.map_batches(audit, batch_format="pyarrow", batch_size=None),
        combine_a,
    )

    def finish(b: pa.Table) -> pa.Table:
        cols = {"source": b["source"]}
        for c in ("n_cells", "n_small_cells", "n_docs_small", "n_docs"):
            cols[c] = b[c].cast(pa.int64())
        return pa.table(cols)

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


KANON_SQL = f"""
WITH cells AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents
  WHERE source IS NOT NULL AND lang IS NOT NULL
  GROUP BY 1, 2
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(CASE WHEN c < {_KANON} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_small_cells,
       CAST(SUM(CASE WHEN c < {_KANON} THEN c ELSE 0 END) AS BIGINT)
         AS n_docs_small,
       CAST(SUM(c) AS BIGINT) AS n_docs
FROM cells GROUP BY 1
"""


# ---------------------------------------------------------------------------
# equi-depth range-partition boundaries per type
# ---------------------------------------------------------------------------

_EQUI_K = 8


def q_equidepth_boundaries_per_type(sf_dir):
    """Range-partitioner design audit: per event type, the 7 exact
    PERCENTILE_DISC boundaries that split the x100 value distribution
    into 8 equal-depth ranges — the split points an engine ships to a
    range shuffle so every partition holds ~n/8 rows regardless of
    skew. The bounded (type, value) count tier is combiner-first; the
    boundary walk runs on the tiny final block."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("event_type", "value"))
        x = _round_half_away(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
            * 100.0
        )
        t = pa.table({"event_type": b["event_type"], "x": pa.array(x)})
        g = t.group_by(["event_type", "x"]).aggregate([([], "count_all")])
        return g.select(["event_type", "x", "count_all"]).rename_columns(
            ["event_type", "x", "c"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "x"]).aggregate([("c", "sum")])
        return g.select(["event_type", "x", "c_sum"]).rename_columns(
            ["event_type", "x", "c"]
        )

    hist = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
        final_shards=8,
        shard_cols=["event_type", "x"],
    ).to_pandas()  # bounded: types x distinct x100 values
    if "event_type" not in hist.columns:  # fully-empty input short-circuit
        hist = pd.DataFrame({"event_type": [], "x": [], "c": []})
    rows = {"event_type": [], "q_idx": [], "boundary_x100": []}
    for et, sub in hist.groupby("event_type", sort=True):
        sub = sub.sort_values("x")
        vals = sub["x"].to_numpy(dtype=np.int64)
        cum = np.cumsum(sub["c"].to_numpy(dtype=np.int64))
        n = int(cum[-1])
        for i in range(1, _EQUI_K):
            rank = int(np.ceil(i * n / _EQUI_K))  # PERCENTILE_DISC rule
            v = int(vals[np.searchsorted(cum, rank, side="left")])
            rows["event_type"].append(et)
            rows["q_idx"].append(i)
            rows["boundary_x100"].append(v)
    return pa.table(
        {
            "event_type": pa.array(rows["event_type"], pa.string()),
            "q_idx": pa.array(rows["q_idx"], pa.int64()),
            "boundary_x100": pa.array(rows["boundary_x100"], pa.int64()),
        }
    )


def _equidepth_sql() -> str:
    picks = "\nUNION ALL\n".join(
        f"SELECT event_type, CAST({i} AS BIGINT) AS q_idx, "
        f"CAST(PERCENTILE_DISC({i}.0 / {_EQUI_K}) WITHIN GROUP (ORDER BY x) "
        f"AS BIGINT) AS boundary_x100 FROM v GROUP BY 1"
        for i in range(1, _EQUI_K)
    )
    return f"""
WITH v AS MATERIALIZED (
  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
)
{picks}
"""


def register_r4u(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "email_url_mentions": q_email_url_mentions,
            "small_group_docs": q_small_group_docs,
            "equidepth_boundaries_per_type": q_equidepth_boundaries_per_type,
        }
    )
    oracles.update(
        {
            "email_url_mentions": MENTIONS_SQL,
            "small_group_docs": KANON_SQL,
            "equidepth_boundaries_per_type": _equidepth_sql(),
        }
    )

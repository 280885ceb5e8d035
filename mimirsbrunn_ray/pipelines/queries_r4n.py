"""Round-4 batch N: first-seen user growth curve, per-type peak
minutes, character-class composition profiles, and audience-overlap
(Jaccard) sufficient statistics between event types.

Exactness discipline: timestamps and counts only (no float anywhere) —
first-seen is an exact MIN over int64 microseconds, char-class counts
come from RE2 character classes evaluated identically by Arrow and
DuckDB, and overlap cardinalities are exact distinct counts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.functions.timeutil import trunc_us, ts_array
from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge


def _not_null(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


# ---------------------------------------------------------------------------
# first-seen user growth curve (new users per hour)
# ---------------------------------------------------------------------------


def q_new_users_hourly(sf_dir):
    """Adoption growth curve: per hour, the number of users whose
    FIRST-EVER event lands in that hour. Scale shape: per-user MIN(ts)
    is a combiner-first partial + user-sharded tree merge (the user
    dimension never sits in one block); the survivors (one int64 row
    per user) collapse to hour counts with a second, hours-bounded
    merge."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("user_id", "ts"))
        t = pa.table(
            {
                "user_id": b["user_id"],
                "us": b["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            }
        )
        g = t.group_by(["user_id"]).aggregate([("us", "min")])
        return g.select(["user_id", "us_min"]).rename_columns(
            ["user_id", "us"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["user_id"]).aggregate([("us", "min")])
        return g.select(["user_id", "us_min"]).rename_columns(
            ["user_id", "us"]
        )

    first = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
        final_shards=8,
        shard_cols=["user_id"],
    )

    def to_hour(b: pa.Table) -> pa.Table:
        us = b["us"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table({"h": pa.array(trunc_us(us, "1h"))})
        g = t.group_by(["h"]).aggregate([([], "count_all")])
        return g.select(["h", "count_all"]).rename_columns(["h", "n"])

    def combine_h(b: pa.Table) -> pa.Table:
        g = b.group_by(["h"]).aggregate([("n", "sum")])
        return g.select(["h", "n_sum"]).rename_columns(["h", "n"])

    out = tree_merge(
        first.map_batches(to_hour, batch_format="pyarrow", batch_size=None),
        combine_h,
    )

    def finish(b: pa.Table) -> pa.Table:
        h = b["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bucket": ts_array(h),
                "n_new_users": b["n"].cast(pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


NEW_USERS_SQL = """
WITH f AS (
  SELECT user_id, MIN(ts) AS fts
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1
)
SELECT date_trunc('hour', fts) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_new_users
FROM f GROUP BY 1
"""


# ---------------------------------------------------------------------------
# per-type peak minutes (busiest k minutes, deterministic ties)
# ---------------------------------------------------------------------------


def q_peak_minutes_per_type(sf_dir):
    """Peak detection: for each event type, the 3 busiest minutes by
    event count (count desc, minute asc on ties) — the per-partition
    ROW_NUMBER top-k over the 1m count tier, so the raw stream
    collapses combiner-first before any ranking moves."""
    from mimirsbrunn_ray.stages.search import grouped_top_k

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("event_type", "ts"))
        ts_us = (
            b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
        )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "m": pa.array(trunc_us(ts_us, "1m")),
            }
        )
        g = t.group_by(["event_type", "m"]).aggregate([([], "count_all")])
        return g.select(["event_type", "m", "count_all"]).rename_columns(
            ["event_type", "m", "n_events"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "m"]).aggregate([("n_events", "sum")])
        return g.select(["event_type", "m", "n_events_sum"]).rename_columns(
            ["event_type", "m", "n_events"]
        )

    tier = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
        final_shards=8,
        shard_cols=["event_type", "m"],
    )

    def stamp(b: pa.Table) -> pa.Table:
        m = b["m"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "event_type": b["event_type"],
                "bucket": ts_array(m),
                "n_events": b["n_events"].cast(pa.int64()),
            }
        )

    stamped = tier.map_batches(stamp, batch_format="pyarrow", batch_size=None)
    return grouped_top_k(
        stamped, ["event_type"], "n_events", k=3, descending=True,
        tiebreak_cols=["bucket"],
    )


PEAK_MINUTES_SQL = """
WITH t AS (
  SELECT event_type, date_trunc('minute', ts) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
)
SELECT event_type, bucket, n_events FROM (
  SELECT event_type, bucket, n_events,
         ROW_NUMBER() OVER (
           PARTITION BY event_type ORDER BY n_events DESC, bucket ASC
         ) AS rn
  FROM t
) WHERE rn <= 3
"""


# ---------------------------------------------------------------------------
# character-class composition per source
# ---------------------------------------------------------------------------


def q_char_class_profile(sf_dir):
    """Per source: exact counts of codepoints by character class
    (ASCII letters / digits / spaces / everything else) over document
    text — the composition profile a data-quality gate reads to catch
    OCR garbage, markup blobs, or binary spills. Vectorized RE2
    character-class counts per batch (Arrow and DuckDB both use RE2, so
    the classes agree codepoint-for-codepoint); combiner-first partials
    per source, sources-bounded tree merge."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["source"]))
        text = pc.fill_null(b["text"], "")
        n_chars = pc.utf8_length(text)
        letters = pc.count_substring_regex(text, "[A-Za-z]")
        digits = pc.count_substring_regex(text, "[0-9]")
        spaces = pc.count_substring_regex(text, " ")
        t = pa.table(
            {
                "source": b["source"],
                "one": pa.array(np.ones(len(b), dtype=np.int64)),
                "n_chars": n_chars.cast(pa.int64()),
                "n_letters": letters.cast(pa.int64()),
                "n_digits": digits.cast(pa.int64()),
                "n_spaces": spaces.cast(pa.int64()),
            }
        )
        g = t.group_by(["source"]).aggregate(
            [("one", "sum"), ("n_chars", "sum"), ("n_letters", "sum"),
             ("n_digits", "sum"), ("n_spaces", "sum")]
        )
        g = g.select(
            ["source", "one_sum", "n_chars_sum", "n_letters_sum",
             "n_digits_sum", "n_spaces_sum"]
        )
        return g.rename_columns(
            ["source", "n_docs", "n_chars", "n_letters", "n_digits",
             "n_spaces"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["source"]).aggregate(
            [("n_docs", "sum"), ("n_chars", "sum"), ("n_letters", "sum"),
             ("n_digits", "sum"), ("n_spaces", "sum")]
        )
        g = g.select(
            ["source", "n_docs_sum", "n_chars_sum", "n_letters_sum",
             "n_digits_sum", "n_spaces_sum"]
        )
        return g.rename_columns(
            ["source", "n_docs", "n_chars", "n_letters", "n_digits",
             "n_spaces"]
        )

    out = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    )

    def finish(b: pa.Table) -> pa.Table:
        other = pc.subtract(
            pc.subtract(
                pc.subtract(b["n_chars"], b["n_letters"]), b["n_digits"]
            ),
            b["n_spaces"],
        )
        return pa.table(
            {
                "source": b["source"],
                "n_docs": b["n_docs"].cast(pa.int64()),
                "n_chars": b["n_chars"].cast(pa.int64()),
                "n_letters": b["n_letters"].cast(pa.int64()),
                "n_digits": b["n_digits"].cast(pa.int64()),
                "n_spaces": b["n_spaces"].cast(pa.int64()),
                "n_other": other.cast(pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


CHAR_CLASS_SQL = """
WITH d AS (
  SELECT source, COALESCE(text, '') AS t
  FROM documents WHERE source IS NOT NULL
), c AS (
  SELECT source,
         CAST(length(t) AS BIGINT) AS n_chars,
         CAST(length(t) - length(regexp_replace(t, '[A-Za-z]', '', 'g'))
           AS BIGINT) AS n_letters,
         CAST(length(t) - length(regexp_replace(t, '[0-9]', '', 'g'))
           AS BIGINT) AS n_digits,
         CAST(length(t) - length(regexp_replace(t, ' ', '', 'g'))
           AS BIGINT) AS n_spaces
  FROM d
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       CAST(SUM(n_letters) AS BIGINT) AS n_letters,
       CAST(SUM(n_digits) AS BIGINT) AS n_digits,
       CAST(SUM(n_spaces) AS BIGINT) AS n_spaces,
       CAST(SUM(n_chars - n_letters - n_digits - n_spaces) AS BIGINT)
         AS n_other
FROM c GROUP BY 1
"""


# ---------------------------------------------------------------------------
# audience-overlap (Jaccard) statistics between event types
# ---------------------------------------------------------------------------


def q_type_user_jaccard(sf_dir):
    """For every unordered pair of event types, the exact audience
    overlap sufficient statistics: |users(a)|, |users(b)| and
    |users(a) AND users(b)| — Jaccard / lift / affinity all derive from
    these three integers. Scale shape: batch-local distinct
    (type, user), ONE user-hash bucket shuffle (each user's type set
    co-locates), per-bucket pair expansion over the tiny per-user sets
    plus per-type partial distinct counts, tree-merged; the final
    assembly joins two types-bounded tables on the driver."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("event_type", "user_id"))
        g = b.group_by(["event_type", "user_id"]).aggregate([])
        return add_bucket(g, "user_id", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "type_a": pd.Series([], dtype=object),
                "type_b": pd.Series([], dtype=object),
                "n_both": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        t = g.drop_duplicates(["event_type", "user_id"])[
            ["event_type", "user_id"]
        ]
        m = t.merge(t, on="user_id")
        m = m[m["event_type_x"] < m["event_type_y"]]
        singles = (
            t.groupby("event_type", sort=False)
            .size()
            .reset_index(name="n_both")
        )
        singles["type_a"] = singles["event_type"]
        singles["type_b"] = ""  # sentinel: per-type distinct-user partial
        singles = singles[["type_a", "type_b", "n_both"]]
        if len(m):
            pairs = (
                m.groupby(["event_type_x", "event_type_y"], sort=False)
                .size()
                .reset_index(name="n_both")
            )
            pairs.columns = ["type_a", "type_b", "n_both"]
            out = pd.concat([pairs, singles], ignore_index=True)
        else:
            out = singles
        out["n_both"] = out["n_both"].astype(np.int64)
        return out

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["type_a", "type_b"]).aggregate([("n_both", "sum")])
        g = g.select(["type_a", "type_b", "n_both_sum"])
        return g.rename_columns(["type_a", "type_b", "n_both"])

    flat = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas"),
        combine,
    ).to_pandas()  # bounded: types + types^2/2 rows
    if "type_a" not in flat.columns:  # fully-empty input short-circuit
        flat = pd.DataFrame({"type_a": [], "type_b": [], "n_both": []})
    singles = dict(
        zip(
            flat.loc[flat["type_b"] == "", "type_a"],
            flat.loc[flat["type_b"] == "", "n_both"].astype(np.int64),
        )
    )
    pairs = flat[flat["type_b"] != ""].sort_values(
        ["type_a", "type_b"], ignore_index=True
    )
    return pa.table(
        {
            "type_a": pa.array(pairs["type_a"].tolist(), pa.string()),
            "type_b": pa.array(pairs["type_b"].tolist(), pa.string()),
            "n_users_a": pa.array(
                [int(singles[t]) for t in pairs["type_a"]], pa.int64()
            ),
            "n_users_b": pa.array(
                [int(singles[t]) for t in pairs["type_b"]], pa.int64()
            ),
            "n_users_both": pa.array(
                pairs["n_both"].astype(np.int64).tolist(), pa.int64()
            ),
        }
    )


TYPE_JACCARD_SQL = """
WITH t AS (
  SELECT DISTINCT event_type, user_id
  FROM events
  WHERE event_type IS NOT NULL AND user_id IS NOT NULL
), c AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY 1
), p AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_users_both
  FROM t a JOIN t b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, ca.n AS n_users_a, cb.n AS n_users_b,
       p.n_users_both
FROM p
JOIN c ca ON ca.event_type = p.type_a
JOIN c cb ON cb.event_type = p.type_b
"""


def register_r4n(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "new_users_hourly": q_new_users_hourly,
            "peak_minutes_per_type": q_peak_minutes_per_type,
            "char_class_profile": q_char_class_profile,
            "type_user_jaccard": q_type_user_jaccard,
        }
    )
    oracles.update(
        {
            "new_users_hourly": NEW_USERS_SQL,
            "peak_minutes_per_type": PEAK_MINUTES_SQL,
            "char_class_profile": CHAR_CLASS_SQL,
            "type_user_jaccard": TYPE_JACCARD_SQL,
        }
    )

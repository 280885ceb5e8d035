"""Round-4 batch FH: path, extraction, and planner-input census —
the top session path PREFIXES (the first three event types of each
30-min session, the branching-funnel view the entry/exit matrix
flattens away), an email-domain histogram over document text (the
'@'-token domain census behind PII/domain filtering), and a
join-key skew profile (per join key: top-group share and exact p99
group size — the numbers the salted-aggregate planner consumes).

Exactness discipline: path strings are deterministic '>'-joins of
the (ts, event_id)-ordered types; domain extraction is the same
split-and-filter on both sides; skew percentiles use the exact
ROW_NUMBER rank rule (lower discrete percentile), never
interpolation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge

_GAP_US = 1_800_000_000
_PREFIX_LEN = 3
_TOP_PATHS = 15


def _mod(a, k: int):
    """Non-negative int64 modulo via checked integer divide."""
    return pc.subtract(a, pc.multiply(pc.divide(a, k), k))


def _round_half_away(x: float) -> int:
    return int(np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5))


def q_session_path_prefixes(sf_dir):
    """Counts of the first-3-event-type path of every session,
    top 15 by (count desc, path asc). One user-hash shuffle builds
    sessions and their ordered type prefixes; path counts fold
    through a sharded combine and the top-15 survives local prunes
    (key-disjoint shards make local top-15 sufficient)."""
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

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"path": pd.Series([], dtype=object),
                 "c": pd.Series([], dtype=np.int64)}
            )
        g = g.sort_values(["user_id", "us", "event_id"],
                          kind="mergesort", ignore_index=True)
        uid = g["user_id"].to_numpy(dtype=np.int64)
        us = g["us"].to_numpy(dtype=np.int64)
        et = g["event_type"].to_numpy()
        first = np.concatenate(([True], uid[1:] != uid[:-1]))
        gap = np.concatenate(([0], us[1:] - us[:-1]))
        brk = first | (gap > _GAP_US)
        sid = np.cumsum(brk)
        df = pd.DataFrame({"sid": sid, "et": et})
        df["rn"] = df.groupby("sid").cumcount()
        df = df[df["rn"] < _PREFIX_LEN]
        paths = (
            df.groupby("sid", sort=True)["et"]
            .agg(lambda s: ">".join(s))
            .value_counts()
        )
        return pd.DataFrame(
            {"path": paths.index, "c": paths.to_numpy(np.int64)}
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["path"]).aggregate([("c", "sum")])
        return g.rename_columns(["path", "c"])

    counts = tree_merge(
        ev.map_batches(project, batch_format="pyarrow",
                       batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_user, batch_format="pandas"),
        combine,
        final_shards=8,
        shard_cols=["path"],
    )

    def local_top(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "path" not in b.column_names:
            return pa.table(
                {"path": pa.array([], pa.string()),
                 "c": pa.array([], pa.int64())}
            )
        df = b.select(["path", "c"]).to_pandas()
        df = df.sort_values(["c", "path"],
                            ascending=[False, True],
                            ignore_index=True)
        return pa.Table.from_pandas(df.head(_TOP_PATHS),
                                    preserve_index=False)

    top = counts.map_batches(local_top, batch_format="pyarrow",
                             batch_size=None).to_pandas()
    if "path" not in top.columns:
        return pa.table(
            {"path": pa.array([], pa.string()),
             "n_sessions": pa.array([], pa.int64())}
        )
    top = top.sort_values(["c", "path"], ascending=[False, True],
                          ignore_index=True).head(_TOP_PATHS)
    return pa.table(
        {
            "path": pa.array(top["path"], pa.string()),
            "n_sessions": pa.array(
                top["c"].to_numpy(dtype=np.int64)
            ),
        }
    )


PATH_SQL = f"""
WITH e AS MATERIALIZED (
  SELECT user_id, EPOCH_US(ts) AS us, event_id, event_type
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL
), lagd AS MATERIALIZED (
  SELECT user_id, us, event_id, event_type,
         CASE WHEN us - LAG(us) OVER w > {_GAP_US}
              OR LAG(us) OVER w IS NULL THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
), sess AS MATERIALIZED (
  SELECT user_id, us, event_id, event_type,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM lagd
), ranked AS MATERIALIZED (
  SELECT user_id, sid, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, sid
                            ORDER BY us, event_id) AS rn
  FROM sess
), paths AS MATERIALIZED (
  SELECT user_id, sid,
         STRING_AGG(event_type, '>' ORDER BY rn) AS path
  FROM ranked WHERE rn <= {_PREFIX_LEN}
  GROUP BY 1, 2
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT {_TOP_PATHS}
"""


def q_email_domain_hist(sf_dir):
    """Domain histogram of '@'-tokens: whitespace tokens containing
    exactly one '@' with non-empty local and domain parts contribute
    their lowercased domain. The synthetic corpus has no literal
    emails, so each row's text is deterministically augmented from
    real columns — ``doc_id@source`` normally, ``doc_id@@source``
    when n_chars%7==0 (two '@' -> excluded) and ``@source`` when
    n_chars%11==0 (empty local -> excluded) — the SAME derivation the
    oracle applies, so the extraction kernel (token split, '@'
    census, local/domain validation) is differentially tested on
    malformed cases too. One streaming pass, (domain)-sharded
    combine, full histogram ordered by (count desc, domain)."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["text", "doc_id", "n_chars", "source"],
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["text"]))
        n_tok = pc.cast(b["n_chars"], pa.int64())
        d = pc.cast(b["doc_id"], pa.string())
        s = b["source"]
        plain = pc.binary_join_element_wise(d, s, "@")
        dbl = pc.binary_join_element_wise(d, pa.scalar(""), s, "@")
        nolocal = pc.binary_join_element_wise(pa.scalar(""), s, "@")
        tok = pc.if_else(
            pc.equal(_mod(n_tok, 11), 0),
            nolocal,
            pc.if_else(pc.equal(_mod(n_tok, 7), 0), dbl, plain),
        )
        aug = pc.binary_join_element_wise(b["text"], tok, " ")
        toks = pc.split_pattern(aug, pattern=" ")
        flat = pc.list_flatten(toks)
        nat = pc.count_substring(flat, "@").to_numpy(
            zero_copy_only=False
        )
        keep = pa.array(nat == 1)
        cand = flat.filter(keep)
        parts = pc.split_pattern(cand, pattern="@")
        # [local, domain] pairs — both non-empty to count
        arr = parts.combine_chunks() if isinstance(
            parts, pa.ChunkedArray
        ) else parts
        lens = pc.list_value_length(arr).to_numpy(
            zero_copy_only=False
        )
        flat2 = pc.list_flatten(arr).to_numpy(zero_copy_only=False)
        ok = lens == 2
        loc = np.where(ok)[0]
        starts = np.zeros(len(lens), np.int64)
        if len(lens):
            starts[1:] = np.cumsum(lens)[:-1]
        local = flat2[starts[loc]]
        dom = flat2[starts[loc] + 1]
        good = (np.char.str_len(local.astype(str)) > 0) & (
            np.char.str_len(dom.astype(str)) > 0
        )
        dom = np.char.lower(dom[good].astype(str))
        t = pa.table(
            {
                "domain": pa.array(dom, pa.string()),
                "c": pa.array(np.ones(len(dom), np.int64)),
            }
        )
        g = t.group_by(["domain"]).aggregate([("c", "sum")])
        return g.rename_columns(["domain", "c"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["domain"]).aggregate([("c", "sum")])
        return g.rename_columns(["domain", "c"])

    out = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow",
                         batch_size=None),
        combine,
        final_shards=8,
        shard_cols=["domain"],
    ).to_pandas()
    if "domain" not in out.columns:
        return pa.table(
            {"domain": pa.array([], pa.string()),
             "n": pa.array([], pa.int64())}
        )
    out = out.sort_values(["c", "domain"],
                          ascending=[False, True],
                          ignore_index=True)
    return pa.table(
        {
            "domain": pa.array(out["domain"], pa.string()),
            "n": pa.array(out["c"].to_numpy(dtype=np.int64)),
        }
    )


EMAIL_DOMAIN_SQL = """
WITH aug AS MATERIALIZED (
  SELECT text || ' ' ||
         CASE WHEN n_chars % 11 = 0 THEN '@' || source
              WHEN n_chars % 7 = 0
                THEN CAST(doc_id AS VARCHAR) || '@@' || source
              ELSE CAST(doc_id AS VARCHAR) || '@' || source
          END AS text
  FROM documents WHERE text IS NOT NULL
), toks AS MATERIALIZED (
  SELECT UNNEST(string_split(text, ' ')) AS tok FROM aug
), cand AS MATERIALIZED (
  SELECT tok FROM toks
  WHERE LENGTH(tok) - LENGTH(REPLACE(tok, '@', '')) = 1
), pairs AS MATERIALIZED (
  SELECT string_split(tok, '@')[1] AS local,
         LOWER(string_split(tok, '@')[2]) AS domain
  FROM cand
)
SELECT domain, CAST(COUNT(*) AS BIGINT) AS n
FROM pairs
WHERE LENGTH(local) > 0 AND LENGTH(domain) > 0
GROUP BY domain ORDER BY n DESC, domain
"""

_SKEW_KEYS = [
    ("lineitem", "l_orderkey"),
    ("lineitem", "l_partkey"),
    ("orders", "o_custkey"),
]


def q_join_key_skew_profile(sf_dir):
    """Per join key column: distinct keys, max group size, exact
    p99 group size (lower discrete rank) and the top group's ppm
    share — the skew numbers that decide broadcast vs shuffle vs
    salt. Group sizes fold through key-disjoint sharded combines;
    the p99 uses the size histogram (bounded by |distinct sizes|),
    never a sort of the key table."""
    rows = {"table_col": [], "n_rows": [], "n_keys": [],
            "max_group": [], "p99_group": [], "top_share_ppm": []}
    for tbl, col in _SKEW_KEYS:
        ds = rd.read_parquet(f"{sf_dir}/{tbl}.parquet",
                             columns=[col])

        def partial(b: pa.Table, col=col) -> pa.Table:
            b = b.filter(pc.is_valid(b[col]))
            g = b.group_by([col]).aggregate([([], "count_all")])
            return g.select([col, "count_all"]).rename_columns(
                ["k", "c"]
            )

        def combine(b: pa.Table) -> pa.Table:
            g = b.group_by(["k"]).aggregate([("c", "sum")])
            return g.rename_columns(["k", "c"])

        sizes = tree_merge(
            ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None),
            combine,
            final_shards=8,
            shard_cols=["k"],
        )

        def hist(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "c" not in b.column_names:
                return pa.table(
                    {"sz": pa.array([], pa.int64()),
                     "n": pa.array([], pa.int64())}
                )
            g = b.group_by(["c"]).aggregate([([], "count_all")])
            return g.select(["c", "count_all"]).rename_columns(
                ["sz", "n"]
            )

        def hist_comb(b: pa.Table) -> pa.Table:
            g = b.group_by(["sz"]).aggregate([("n", "sum")])
            return g.rename_columns(["sz", "n"])

        h = tree_merge(
            sizes.map_batches(hist, batch_format="pyarrow",
                              batch_size=None),
            hist_comb,
        ).to_pandas()
        if len(h) == 0 or "sz" not in h.columns:
            continue
        h = h.sort_values("sz", ignore_index=True)
        sz = h["sz"].to_numpy(dtype=np.int64)
        n = h["n"].to_numpy(dtype=np.int64)
        n_keys = int(n.sum())
        n_rows = int(np.sum(sz * n))
        cum = np.cumsum(n)
        # lower discrete p99: rank = (n_keys - 1) * 99 // 100 + 1
        rank = (n_keys - 1) * 99 // 100 + 1
        p99 = int(sz[np.searchsorted(cum, rank)])
        mx = int(sz.max())
        rows["table_col"].append(f"{tbl}.{col}")
        rows["n_rows"].append(n_rows)
        rows["n_keys"].append(n_keys)
        rows["max_group"].append(mx)
        rows["p99_group"].append(p99)
        rows["top_share_ppm"].append(
            _round_half_away(mx / n_rows * 1e6) if n_rows else 0
        )
    return pa.table(
        {
            "table_col": pa.array(rows["table_col"], pa.string()),
            **{
                c: pa.array(rows[c], pa.int64())
                for c in ["n_rows", "n_keys", "max_group",
                          "p99_group", "top_share_ppm"]
            },
        }
    )


def _skew_sql_one(tbl: str, col: str) -> str:
    return f"""
  SELECT '{tbl}.{col}' AS table_col,
         CAST(SUM(c) AS BIGINT) AS n_rows,
         CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(MAX(c) AS BIGINT) AS max_group,
         CAST(MAX(CASE WHEN rn = (nk - 1) * 99 // 100 + 1
                       THEN c END) AS BIGINT) AS p99_group,
         CAST(ROUND(CAST(MAX(c) AS DOUBLE)
              / CAST(SUM(c) AS DOUBLE) * 1000000, 0) AS BIGINT)
           AS top_share_ppm
  FROM (SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS rn,
               COUNT(*) OVER () AS nk
        FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM {tbl}
              WHERE {col} IS NOT NULL GROUP BY {col}))
"""


SKEW_SQL = (
    "SELECT * FROM (\n"
    + "\nUNION ALL\n".join(
        _skew_sql_one(t, c) for t, c in _SKEW_KEYS
    )
    + "\n) ORDER BY table_col"
)


def register_r4fh(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "session_path_prefixes": q_session_path_prefixes,
            "email_domain_hist": q_email_domain_hist,
            "join_key_skew_profile": q_join_key_skew_profile,
        }
    )
    oracles.update(
        {
            "session_path_prefixes": PATH_SQL,
            "email_domain_hist": EMAIL_DOMAIN_SQL,
            "join_key_skew_profile": SKEW_SQL,
        }
    )

"""Round-4 continuation batch 2: the remaining TPC-H shapes expressible on
the available columns (Q8 market share, Q15 top supplier, Q17 small-quantity
revenue), M4 visualization downsampling (Jugel et al., VLDB 2014 — the
width-pixel min/max/first/last POINT-selection operator), an inverted-index
posting-list builder (the search-indexing primitive behind the reference's
Elasticsearch import — /root/reference/libs/mimir/src/rubber.rs:200-260
builds exactly this structure server-side), and a Prometheus-style
histogram_quantile over le-bucketed counters.

Exactness discipline (SURVEY.md §6): every float feeding a SUM is quantized
per-term to int64 fixed point BEFORE summation; the only float derivations
(market share, interpolated quantile) happen once, at the end, from
identical integer operands on both sides, so IEEE-754 gives bit-equal
doubles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from mimirsbrunn_ray.stages.broadcast import safe_join as _safe_join


# Shared fixed-point / broadcast-membership helpers (used by queries_r4d too).


def _rev_e4(b: pa.Table) -> pa.ChunkedArray:
    """extendedprice*(1-discount) as exact int64 x1e4 (cents x (100-disc%))."""
    price_c = pc.round(pc.multiply(b["l_extendedprice"], pa.scalar(100.0)))
    disc_c = pc.round(pc.multiply(b["l_discount"], pa.scalar(100.0)))
    return pc.multiply(
        price_c.cast(pa.int64()),
        pc.subtract(pa.scalar(100, type=pa.int64()), disc_c.cast(pa.int64())),
    )


def _sorted_key_ref(keys: np.ndarray):
    """ray.put a sorted int64 key array for membership probes (ships once
    per task spec, searchsorted per batch)."""
    import ray as _ray

    return _ray.put(np.sort(keys.astype(np.int64), kind="stable"))


def _member_mask(keys: np.ndarray, sorted_ref) -> np.ndarray:
    import ray as _ray

    lk = _ray.get(sorted_ref)
    if len(lk) == 0:
        return np.zeros(len(keys), dtype=bool)
    idx = np.clip(np.searchsorted(lk, keys), 0, len(lk) - 1)
    return lk[idx] == keys


# ---------------------------------------------------------------------------
# TPC-H Q17: small-quantity-order revenue
# ---------------------------------------------------------------------------

_Q17_BRAND = "Brand#23"


def q_tpch_q17_small_qty(sf_dir):
    """TPC-H Q17 shape: average yearly revenue lost if small-quantity
    orders (quantity < 20% of the part's average) were not filled, for one
    brand. The correlated AVG subquery decomposes into per-part (sum_qty,
    count) partials over the brand-filtered lineitems; the comparison
    `qty < 0.2 * avg` cross-multiplies to the EXACT integer predicate
    `5 * qty_x100 * cnt < sum_qty_x100` (quantities are money-like 2dp),
    so no float division ever happens inside the filter.

    Scale shape: the brand partkey set ships once as a sorted membership
    array; pass 1 tree-merges per-part stats (bounded by |brand parts| —
    a filtered dim, the Q19 broadcast class); pass 2 streams lineitem
    again with the stats as a broadcast sorted-array lookup; the output is
    one row of int64 sums with the single /7.0 derivation at the end."""
    import ray as _ray

    import pyarrow.parquet as _pq

    from mimirsbrunn_ray.stages.rollup import tree_merge

    from mimirsbrunn_ray.stages.broadcast import dim_fits

    if not dim_fits(sf_dir, "part"):  # pragma: no cover - scale path
        raise NotImplementedError(
            "distributed-dim fallback: attach_dim on the part key "
            "(stages/broadcast.py)")
    part = _pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    brand_ref = _sorted_key_ref(
        part.filter(pc.equal(part["p_brand"], _Q17_BRAND))["p_partkey"].to_numpy()
    )

    def stat_partial(b: pa.Table) -> pa.Table:
        keep = _member_mask(b["l_partkey"].to_numpy(), brand_ref)
        b = b.filter(pa.array(keep))
        q100 = pc.round(pc.multiply(b["l_quantity"], pa.scalar(100.0))).cast(
            pa.int64()
        )
        t = pa.table(
            {
                "l_partkey": b["l_partkey"],
                "sq": q100,
                "cnt": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            }
        )
        g = t.group_by(["l_partkey"]).aggregate([("sq", "sum"), ("cnt", "sum")])
        return g.rename_columns(["l_partkey", "sq", "cnt"])

    li_cols = ["l_partkey", "l_quantity", "l_extendedprice"]
    stats = tree_merge(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=li_cols[:2]).map_batches(
            stat_partial, batch_format="pyarrow", batch_size=None
        ),
        lambda b: b.group_by(["l_partkey"])
        .aggregate([("sq", "sum"), ("cnt", "sum")])
        .rename_columns(["l_partkey", "sq", "cnt"]),
    )
    st_blocks = list(stats.iter_batches(batch_format="pyarrow"))
    st = (
        pa.concat_tables(st_blocks)
        if st_blocks
        else pa.table(
            {
                "l_partkey": pa.array([], pa.int64()),
                "sq": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
            }
        )
    )
    if st.num_rows:
        k = st["l_partkey"].to_numpy()
        order = np.argsort(k, kind="stable")
        stats_ref = _ray.put(
            (
                k[order],
                st["sq"].to_numpy()[order],
                st["cnt"].to_numpy()[order],
            )
        )
    else:
        stats_ref = _ray.put(
            (np.array([], np.int64), np.array([], np.int64), np.array([], np.int64))
        )

    def small_partial(b: pa.Table) -> pa.Table:
        keys_sorted, sq, cnt = _ray.get(stats_ref)
        k = b["l_partkey"].to_numpy()
        if len(keys_sorted) == 0:
            small = np.zeros(len(k), dtype=bool)
        else:
            pos = np.clip(np.searchsorted(keys_sorted, k), 0, len(keys_sorted) - 1)
            hit = keys_sorted[pos] == k
            q100 = np.round(
                b["l_quantity"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
            small = hit & (
                5 * q100 * np.where(hit, cnt[pos], 0) < np.where(hit, sq[pos], 0)
            )
        b = b.filter(pa.array(small))
        price_c = pc.round(pc.multiply(b["l_extendedprice"], pa.scalar(100.0))).cast(
            pa.int64()
        )
        tot = pc.sum(price_c).as_py() or 0
        return pa.table(
            {
                "total_e2": pa.array([tot], pa.int64()),
                "n_items": pa.array([b.num_rows], pa.int64()),
            }
        )

    partials = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=li_cols
    ).map_batches(small_partial, batch_format="pyarrow", batch_size=None)

    def combine(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "total_e2": pa.array(
                    [pc.sum(b["total_e2"]).as_py() or 0], pa.int64()
                ),
                "n_items": pa.array(
                    [pc.sum(b["n_items"]).as_py() or 0], pa.int64()
                ),
            }
        )

    merged = tree_merge(partials, combine)

    def finish(b: pa.Table) -> pa.Table:
        b = combine(b)  # tree_merge converges to one block; be defensive
        avg = float(b["total_e2"][0].as_py()) / 7.0
        return b.append_column("avg_yearly_e2", pa.array([avg], pa.float64()))

    return merged.map_batches(finish, batch_format="pyarrow", batch_size=None)


TPCH_Q17_SQL = f"""
WITH b AS (SELECT p_partkey FROM part WHERE p_brand = '{_Q17_BRAND}'),
st AS (
  SELECT l_partkey,
         CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) AS sq,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem JOIN b ON l_partkey = p_partkey
  GROUP BY 1
)
SELECT
  CAST(COALESCE(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)), 0)
       AS BIGINT) AS total_e2,
  CAST(COUNT(*) AS BIGINT) AS n_items,
  CAST(COALESCE(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)), 0)
       AS DOUBLE) / 7.0 AS avg_yearly_e2
FROM lineitem l JOIN st ON l.l_partkey = st.l_partkey
WHERE 5 * CAST(ROUND(l.l_quantity * 100, 0) AS BIGINT) * st.cnt < st.sq
"""


# ---------------------------------------------------------------------------
# M4 visualization downsampling (point selection, not aggregation)
# ---------------------------------------------------------------------------

_M4_ROLES = ("first", "last", "low", "high")


def q_m4_downsample(sf_dir):
    """M4 width-pixel downsampling (Jugel et al., VLDB 2014): per
    (series, pixel-bucket) select the ACTUAL ROWS hit by min/max time and
    min/max value — the four points that make a line rendering of the
    bucket pixel-exact, unlike OHLC which emits aggregates. One row per
    (event_type, hour-bucket, role).

    Scale shape: each row flat-maps into 4 role rows with sign-encoded
    (k1, k2, k3) sort keys so every role reduces by the SAME min-select;
    grouped_top_k's per-batch partial prune keeps <= 1 row per
    (series, bucket, role) per batch, so the single hash shuffle moves
    4 x |buckets seen|, never the corpus. Ties resolve by (ts, event_id)
    exactly as the oracle's ROW_NUMBER ordering."""
    from mimirsbrunn_ray.stages.search import grouped_top_k

    def expand(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(pc.is_valid(b["event_type"]), pc.is_valid(b["ts"])),
                pc.is_valid(b["value"]),
            )
        )
        ts64 = b["ts"].cast(pa.int64()).to_numpy()  # us since epoch < 2^53
        ev = b["event_id"].to_numpy()
        val = b["value"].to_numpy(zero_copy_only=False)
        bucket = pc.floor_temporal(b["ts"], unit="hour")
        n = b.num_rows
        tsd = ts64.astype(np.float64)
        # (k1, k2, k3) per role; min over the triple == the oracle ordering
        k1 = [tsd, -tsd, val, -val]
        k2 = [ev, -ev, ts64, ts64]
        k3 = [np.zeros(n, np.int64), np.zeros(n, np.int64), ev, ev]
        parts = []
        for i, role in enumerate(_M4_ROLES):
            parts.append(
                pa.table(
                    {
                        "event_type": b["event_type"],
                        "bucket": bucket,
                        "role": pa.array([role] * n, pa.string()),
                        "ts": b["ts"],
                        "value": b["value"],
                        "k1": pa.array(k1[i], pa.float64()),
                        "k2": pa.array(k2[i], pa.int64()),
                        "k3": pa.array(k3[i], pa.int64()),
                    }
                )
            )
        return pa.concat_tables(parts)

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
    ).map_batches(expand, batch_format="pyarrow", batch_size=None)

    picked = grouped_top_k(
        ev,
        group_cols=["event_type", "bucket", "role"],
        order_col="k1",
        k=1,
        descending=False,
        tiebreak_cols=("k2", "k3"),
    )
    return picked.map_batches(
        lambda b: b.select(["event_type", "bucket", "role", "ts", "value"]),
        batch_format="pyarrow",
        batch_size=None,
    )


M4_SQL = """
WITH e AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket, ts, value, event_id
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), r AS (
  SELECT *,
    ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                       ORDER BY ts, event_id) AS rf,
    ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                       ORDER BY ts DESC, event_id DESC) AS rl,
    ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                       ORDER BY value, ts, event_id) AS rlo,
    ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                       ORDER BY value DESC, ts, event_id) AS rhi
  FROM e
)
SELECT event_type, bucket, 'first' AS role, ts, value FROM r WHERE rf = 1
UNION ALL
SELECT event_type, bucket, 'last', ts, value FROM r WHERE rl = 1
UNION ALL
SELECT event_type, bucket, 'low', ts, value FROM r WHERE rlo = 1
UNION ALL
SELECT event_type, bucket, 'high', ts, value FROM r WHERE rhi = 1
"""


# ---------------------------------------------------------------------------
# Inverted-index posting lists (the search-index build primitive)
# ---------------------------------------------------------------------------

_POSTING_MIN_DF_FRAC = 0.6
_POSTING_CAP = 20


def q_inverted_postings(sf_dir):
    """Inverted-index posting lists for high-df terms: term -> document
    frequency + the first ``_POSTING_CAP`` doc_ids ascending, comma-joined.
    This is the structure the reference hands Elasticsearch to build
    (rubber.rs bulk-indexes docs and ES builds postings server-side); here
    the index build itself is the distributed operator.

    Scale shape: doc rows are unique per doc_id, so within-batch
    (term, doc) dedup yields globally unique pairs with NO distinct
    shuffle; df is a combiner-first count tree merge (driver state =
    |vocab| rows, the classic term-dictionary small side); the posting cap
    bounds per-term output before the one grouped-top-k hash shuffle, so
    no term's full posting list ever colocates."""
    import ray as _ray

    from mimirsbrunn_ray.stages.rollup import tree_merge
    from mimirsbrunn_ray.stages.search import grouped_top_k

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    n_docs = docs.count()
    min_df = _POSTING_MIN_DF_FRAC * n_docs

    def pairs_of(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(
            pc.utf8_lower(pc.fill_null(b["text"], "")), " "
        )
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        doc = np.repeat(b["doc_id"].to_numpy(), lens)
        t = pa.table({"term": pc.list_flatten(words), "doc_id": pa.array(doc)})
        # one (term, doc) pair per doc — doc_ids are unique per row, so
        # this within-batch dedup is already the global dedup
        g = t.group_by(["term", "doc_id"]).aggregate([])
        return g

    pairs = docs.map_batches(
        pairs_of, batch_format="pyarrow", batch_size=None
    ).materialize()

    df = tree_merge(
        pairs.map_batches(
            lambda b: b.group_by(["term"])
            .aggregate([([], "count_all")])
            .rename_columns(["term", "df"]),
            batch_format="pyarrow",
            batch_size=None,
        ),
        lambda b: b.group_by(["term"])
        .aggregate([("df", "sum")])
        .rename_columns(["term", "df"]),
    )
    from mimirsbrunn_ray.stages.broadcast import collect_typed

    dft = collect_typed(df, pa.schema([("term", pa.string()),
                                       ("df", pa.int64())]))
    dft = dft.filter(pc.greater_equal(dft["df"], pa.scalar(min_df)))
    terms = dft["term"].to_numpy(zero_copy_only=False)
    order = np.argsort(terms, kind="stable")
    df_ref = _ray.put((terms[order], dft["df"].to_numpy()[order]))

    def keep_hot(b: pa.Table) -> pa.Table:
        hot, _ = _ray.get(df_ref)
        t = b["term"].to_numpy(zero_copy_only=False)
        if len(hot) == 0:
            return b.slice(0, 0)
        idx = np.clip(np.searchsorted(hot, t), 0, len(hot) - 1)
        return b.filter(pa.array(hot[idx] == t))

    capped = grouped_top_k(
        pairs.map_batches(keep_hot, batch_format="pyarrow", batch_size=None),
        group_cols=["term"],
        order_col="doc_id",
        k=_POSTING_CAP,
        descending=False,
    )

    def join_postings(g: pa.Table) -> pa.Table:
        hot, dfs = _ray.get(df_ref)
        term = g["term"][0].as_py()
        ids = np.sort(g["doc_id"].to_numpy())
        i = int(np.searchsorted(hot, term))
        dfv = int(dfs[i]) if i < len(hot) and hot[i] == term else 0
        return pa.table(
            {
                "term": pa.array([term], pa.string()),
                "df": pa.array([dfv], pa.int64()),
                "posting_csv": pa.array(
                    [",".join(str(int(x)) for x in ids)], pa.string()
                ),
            }
        )

    # the capped postings are <= |hot terms| x CAP rows — the per-term
    # concat runs as a grouped apply over that bounded set
    return capped.groupby("term").map_groups(
        join_postings, batch_format="pyarrow"
    )


POSTINGS_SQL = f"""
WITH w AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id,
           unnest(string_split(COALESCE(lower(text), ''), ' ')) AS term
    FROM documents
  )
), df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM w GROUP BY 1
  HAVING COUNT(*) >= {_POSTING_MIN_DF_FRAC} * (SELECT COUNT(*) FROM documents)
), capped AS (
  SELECT term, doc_id,
         ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) AS rn
  FROM w WHERE term IN (SELECT term FROM df)
)
SELECT c.term, d.df,
       string_agg(CAST(c.doc_id AS VARCHAR), ',' ORDER BY c.doc_id)
         AS posting_csv
FROM capped c JOIN df d ON c.term = d.term
WHERE c.rn <= {_POSTING_CAP}
GROUP BY c.term, d.df
"""


# ---------------------------------------------------------------------------
# Prometheus-style histogram_quantile over le-bucketed counters
# ---------------------------------------------------------------------------

_HQ_LE = (1.0, 2.0, 5.0, 10.0, 20.0, 50.0, 100.0, 200.0, 500.0)
_HQ_Q = 0.95


def q_histogram_quantile(sf_dir):
    """Prometheus ``histogram_quantile(0.95, ...)`` per event type: counts
    land in fixed le-buckets (value <= bound), and the quantile linearly
    interpolates inside the boundary bucket — the metrics-store answer to
    "p95 without a sort", trading exactness for a FIXED-size state per
    series (len(LE)+1 int64s) that merges by plain addition.

    Scale shape: per-(type, bucket-idx) int64 count partials tree-merge;
    the finish stage works on |types| x |buckets| rows. The interpolation
    `lo + (hi - lo) * ((q * total - below) / cnt)` runs once per type from
    identical int64 operands on both sides, so the doubles are bit-equal.
    If p95 lands in the +Inf bucket, the highest finite bound is returned
    (the Prometheus convention)."""
    from mimirsbrunn_ray.stages.rollup import tree_merge

    le = np.asarray(_HQ_LE)

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["event_type"]), pc.is_valid(b["value"]))
        )
        v = b["value"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(le, v, side="left").astype(np.int64)
        t = pa.table(
            {
                "event_type": b["event_type"],
                "idx": pa.array(idx),
                "n": pa.array(np.ones(len(v), np.int64)),
            }
        )
        g = t.group_by(["event_type", "idx"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "idx", "n"])

    merged = tree_merge(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        ).map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["event_type", "idx"])
        .aggregate([("n", "sum")])
        .rename_columns(["event_type", "idx", "n"]),
    )

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "p95": pa.array([], pa.float64()),
                    "total": pa.array([], pa.int64()),
                }
            )
        pdf = b.to_pandas()
        out_t, out_p, out_n = [], [], []
        for et, g in pdf.groupby("event_type", sort=True):
            counts = np.zeros(len(le) + 1, np.int64)
            counts[g["idx"].to_numpy()] = g["n"].to_numpy()
            cum = np.cumsum(counts)
            total = int(cum[-1])
            rank = _HQ_Q * float(total)
            j = int(np.argmax(cum.astype(np.float64) >= rank))
            if j >= len(le):
                p = float(le[-1])
            else:
                lo = float(le[j - 1]) if j > 0 else 0.0
                hi = float(le[j])
                below = float(cum[j - 1]) if j > 0 else 0.0
                p = lo + (hi - lo) * ((rank - below) / float(counts[j]))
            out_t.append(et)
            out_p.append(p)
            out_n.append(total)
        return pa.table(
            {
                "event_type": pa.array(out_t, pa.string()),
                "p95": pa.array(out_p, pa.float64()),
                "total": pa.array(out_n, pa.int64()),
            }
        )

    # tree_merge converges to one block; finish maps over that block
    return merged.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None
    )


_HQ_CASE = " ".join(
    f"WHEN value <= {b} THEN {i}" for i, b in enumerate(_HQ_LE)
)
_HQ_LO_CASE = " ".join(
    f"WHEN idx = {i} THEN {0.0 if i == 0 else _HQ_LE[i - 1]}"
    for i in range(len(_HQ_LE))
)
_HQ_HI_CASE = " ".join(f"WHEN idx = {i} THEN {b}" for i, b in enumerate(_HQ_LE))

HISTOGRAM_QUANTILE_SQL = f"""
WITH b AS (
  SELECT event_type,
         CAST(CASE {_HQ_CASE} ELSE {len(_HQ_LE)} END AS BIGINT) AS idx,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
), c AS (
  SELECT event_type, idx, n,
         CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY idx) AS BIGINT)
           AS cum,
         CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS total
  FROM b
), pick AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY idx) AS rn
  FROM c WHERE CAST(cum AS DOUBLE) >= {_HQ_Q} * CAST(total AS DOUBLE)
)
SELECT event_type,
       CASE WHEN idx >= {len(_HQ_LE)} THEN {_HQ_LE[-1]}
            ELSE (CASE {_HQ_LO_CASE} END)
                 + ((CASE {_HQ_HI_CASE} END) - (CASE {_HQ_LO_CASE} END))
                   * (({_HQ_Q} * CAST(total AS DOUBLE)
                       - CAST(cum - n AS DOUBLE)) / CAST(n AS DOUBLE))
       END AS p95,
       total
FROM pick WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# TPC-H Q4 shape: EXISTS-filtered order counts per priority
# ---------------------------------------------------------------------------


def q_tpch_q4_priority(sf_dir):
    """TPC-H Q4 shape (the commit/receipt-date predicate adapted to the
    available columns): count orders per priority that have AT LEAST ONE
    high-quantity lineitem — the correlated EXISTS.

    Scale shape: the qualifying-lineitem side reduces to its DISTINCT
    orderkeys inside the bloom semi-join's one right-side pass; orders
    date-filter early; the EXISTS is the bloom-pruned exact semi-join
    (exactly-once emission = SQL EXISTS), and the final per-priority count
    tree-merges a 5-row table."""
    from mimirsbrunn_ray.stages.join import bloom_semi_join
    from mimirsbrunn_ray.stages.rollup import tree_merge

    lo = np.datetime64("1997-01-01", "us")
    hi = np.datetime64("1997-10-01", "us")

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.greater_equal(b["o_orderdate"], pa.scalar(lo)),
                pc.less(b["o_orderdate"], pa.scalar(hi)),
            )
        ).select(["o_orderkey", "o_orderpriority"]),
        batch_format="pyarrow",
        batch_size=None,
    )
    big_li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    ).map_batches(
        lambda b: b.filter(
            pc.greater(b["l_quantity"], pa.scalar(45.0))
        ).select(["l_orderkey"]),
        batch_format="pyarrow",
        batch_size=None,
    )
    hit = bloom_semi_join(orders, big_li, "o_orderkey", "l_orderkey")

    return tree_merge(
        hit.map_batches(
            lambda b: b.group_by(["o_orderpriority"])
            .aggregate([([], "count_all")])
            .rename_columns(["o_orderpriority", "order_count"]),
            batch_format="pyarrow",
            batch_size=None,
        ),
        lambda b: b.group_by(["o_orderpriority"])
        .aggregate([("order_count", "sum")])
        .rename_columns(["o_orderpriority", "order_count"]),
    )


TPCH_Q4_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45
  )
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# TPC-H Q21 shape: exclusive-supplier order counts
# ---------------------------------------------------------------------------


def q_exclusive_supplier_orders(sf_dir):
    """TPC-H Q21's structural core on the available columns: orders served
    by EXACTLY ONE distinct supplier, counted per that supplier; top 10
    suppliers by exclusive-order count (ties by suppkey).

    Scale shape: per-order distinct-supplier state is decomposable as
    (min_supp, max_supp, any-two-differ flag) — constant size per order,
    no distinct-set shuffle: a per-batch group partial emits (orderkey,
    min, max), the orderkey tree merge ANDs min==max, and the survivor
    rows feed a combiner-first per-supplier count + constant-group top-k
    prune."""
    from mimirsbrunn_ray.stages.rollup import tree_merge
    from mimirsbrunn_ray.stages.search import grouped_top_k

    def order_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {"l_orderkey": b["l_orderkey"], "mn": b["l_suppkey"], "mx": b["l_suppkey"]}
        )
        g = t.group_by(["l_orderkey"]).aggregate([("mn", "min"), ("mx", "max")])
        return g.rename_columns(["l_orderkey", "mn", "mx"])

    per_order = tree_merge(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
        ).map_batches(order_partial, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["l_orderkey"])
        .aggregate([("mn", "min"), ("mx", "max")])
        .rename_columns(["l_orderkey", "mn", "mx"]),
        final_shards=8,
        shard_cols=["l_orderkey"],
    )

    def supp_partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["mn"], b["mx"]))
        t = pa.table({"s_suppkey": b["mn"].cast(pa.int64())})
        g = t.group_by(["s_suppkey"]).aggregate([([], "count_all")])
        return g.rename_columns(["s_suppkey", "exclusive_orders"])

    per_supp = tree_merge(
        per_order.map_batches(supp_partial, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["s_suppkey"])
        .aggregate([("exclusive_orders", "sum")])
        .rename_columns(["s_suppkey", "exclusive_orders"]),
    )
    top = grouped_top_k(
        per_supp.map_batches(
            lambda b: b.append_column(
                "_g", pa.array(np.zeros(b.num_rows, dtype=np.int8))
            ),
            batch_format="pyarrow",
            batch_size=None,
        ),
        group_cols=["_g"],
        order_col="exclusive_orders",
        k=10,
        descending=True,
        tiebreak_cols=("s_suppkey",),
    )
    return top.map_batches(
        lambda b: b.drop_columns(["_g"]), batch_format="pyarrow", batch_size=None
    )


EXCLUSIVE_SUPPLIER_SQL = """
WITH po AS (
  SELECT l_orderkey, MIN(l_suppkey) AS mn, MAX(l_suppkey) AS mx
  FROM lineitem GROUP BY 1
)
SELECT CAST(mn AS BIGINT) AS s_suppkey,
       CAST(COUNT(*) AS BIGINT) AS exclusive_orders
FROM po WHERE mn = mx
GROUP BY 1
ORDER BY exclusive_orders DESC, s_suppkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: above-average-balance customers with no recent orders
# ---------------------------------------------------------------------------


def q_idle_rich_customers(sf_dir):
    """TPC-H Q22 shape on the available columns: per nation, count and
    total balance of customers whose balance beats the GLOBAL average of
    positive balances and who placed NO orders from 1999 on.

    Scale shape: the global average is two int64 scalars (sum of 2dp
    balances x100, count) tree-merged in one pass; the threshold compare
    cross-multiplies to the EXACT integer predicate
    `bal_x100 * cnt > sum_x100` — no float average ever feeds a filter.
    The NOT EXISTS is the bloom-pruned exact ANTI-join (bloom-absent rows
    are definitely order-less and skip the verify join). Output is a
    per-nation int64 rollup."""
    from mimirsbrunn_ray.stages.join import bloom_anti_join
    from mimirsbrunn_ray.stages.rollup import tree_merge

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    )

    def avg_partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater(b["c_acctbal"], pa.scalar(0.0)))
        bal = pc.round(pc.multiply(b["c_acctbal"], pa.scalar(100.0))).cast(pa.int64())
        return pa.table(
            {
                "sum_e2": pa.array([pc.sum(bal).as_py() or 0], pa.int64()),
                "cnt": pa.array([b.num_rows], pa.int64()),
            }
        )

    from mimirsbrunn_ray.stages.broadcast import collect_typed as _ct

    stat = _ct(
        tree_merge(
            cust.map_batches(avg_partial, batch_format="pyarrow",
                             batch_size=None),
            lambda b: pa.table(
                {
                    "sum_e2": pa.array([pc.sum(b["sum_e2"]).as_py() or 0], pa.int64()),
                    "cnt": pa.array([pc.sum(b["cnt"]).as_py() or 0], pa.int64()),
                }
            ),
        ),
        pa.schema([("sum_e2", pa.int64()), ("cnt", pa.int64())]),
    )
    sum_e2 = int(stat["sum_e2"][0].as_py()) if stat.num_rows else 0
    cnt = int(stat["cnt"][0].as_py()) if stat.num_rows else 0

    rich = cust.map_batches(
        lambda b: b.filter(
            pc.greater(
                pc.multiply(
                    pc.round(pc.multiply(b["c_acctbal"], pa.scalar(100.0))).cast(
                        pa.int64()
                    ),
                    pa.scalar(cnt, pa.int64()),
                ),
                pa.scalar(sum_e2, pa.int64()),
            )
        ),
        batch_format="pyarrow",
        batch_size=None,
    )

    lo = np.datetime64("1999-01-01", "us")
    recent = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    ).map_batches(
        lambda b: b.filter(
            pc.greater_equal(b["o_orderdate"], pa.scalar(lo))
        ).select(["o_custkey"]),
        batch_format="pyarrow",
        batch_size=None,
    )
    idle = bloom_anti_join(rich, recent, "c_custkey", "o_custkey")

    def nat_partial(b: pa.Table) -> pa.Table:
        bal = pc.round(pc.multiply(b["c_acctbal"], pa.scalar(100.0))).cast(pa.int64())
        t = pa.table(
            {
                "c_nationkey": b["c_nationkey"].cast(pa.int64()),
                "total_bal_e2": bal,
            }
        )
        g = t.group_by(["c_nationkey"]).aggregate(
            [("total_bal_e2", "sum"), ([], "count_all")]
        )
        return g.rename_columns(["c_nationkey", "total_bal_e2", "n_custs"])

    out = tree_merge(
        idle.map_batches(nat_partial, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["c_nationkey"])
        .aggregate([("total_bal_e2", "sum"), ("n_custs", "sum")])
        .rename_columns(["c_nationkey", "total_bal_e2", "n_custs"]),
    ).materialize()
    if out.count() == 0:
        # an all-empty union drops the schema; the driver compare needs
        # the typed empty
        return pa.table(
            {
                "c_nationkey": pa.array([], pa.int64()),
                "total_bal_e2": pa.array([], pa.int64()),
                "n_custs": pa.array([], pa.int64()),
            }
        )
    return out


IDLE_RICH_SQL = """
WITH s AS (
  SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
           AS sum_e2,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM customer WHERE c_acctbal > 0.0
)
SELECT CAST(c.c_nationkey AS BIGINT) AS c_nationkey,
       CAST(SUM(CAST(ROUND(c.c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
         AS total_bal_e2,
       CAST(COUNT(*) AS BIGINT) AS n_custs
FROM customer c, s
WHERE CAST(ROUND(c.c_acctbal * 100, 0) AS BIGINT) * s.cnt > s.sum_e2
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '1999-01-01'
  )
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# linear-interpolation gap-fill (the north-star's second fill policy,
# driver-oracled — LOCF has been oracled since round 1)
# ---------------------------------------------------------------------------


def q_gapfill_linear_1m(sf_dir):
    """The 1m rollup tier gap-filled by LINEAR interpolation
    (stages/gapfill.py policy="linear"): missing buckets take
    ``slope * (t - t0) + v0`` between their known neighbors — numpy's
    compiled np.interp formula, which the oracle mirrors operation-for-
    operation (and np.rint's round-HALF-EVEN for the integer token
    columns maps to DuckDB round_even), so every filled value is
    bit-equal."""
    from mimirsbrunn_ray.sources.documents_adapter import sequences_from_documents
    from mimirsbrunn_ray.stages.gapfill import gapfill
    from mimirsbrunn_ray.stages.rollup import rollup

    seq = sequences_from_documents(sf_dir)
    return gapfill(rollup(seq, "1m", from_tier="raw"), "1m", policy="linear")


def _gapfill_linear_sql() -> str:
    from mimirsbrunn_ray.sources.documents_adapter import SEQ_CTE

    # per value column: v0/t0 from the last KNOWN row at-or-before, v1/t1
    # from the first KNOWN row at-or-after; filled rows interpolate with
    # numpy's exact formula slope*(t-t0)+v0
    cols = ["sum_tok", "min_tok", "max_tok", "mean_tok"]
    prev = ",\n    ".join(
        f"last_value({c} IGNORE NULLS) OVER wprev AS p_{c}" for c in cols
    )
    nxt = ",\n    ".join(
        f"first_value({c} IGNORE NULLS) OVER wnext AS n_{c}" for c in cols
    )

    def interp(c):
        return (
            f"((CAST(n_{c} AS DOUBLE) - CAST(p_{c} AS DOUBLE))"
            f" / (CAST(t1 AS DOUBLE) - CAST(t0 AS DOUBLE)))"
            f" * (CAST(t AS DOUBLE) - CAST(t0 AS DOUBLE))"
            f" + CAST(p_{c} AS DOUBLE)"
        )

    return (
        SEQ_CTE
        + f"""
, r AS (
  SELECT source, date_trunc('minute', ts) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(n_tok) AS BIGINT) AS sum_tok,
         CAST(MIN(n_tok) AS INTEGER) AS min_tok,
         CAST(MAX(n_tok) AS INTEGER) AS max_tok,
         CAST(SUM(n_tok) AS DOUBLE) / COUNT(*) AS mean_tok
  FROM seq GROUP BY source, bucket),
bounds AS (SELECT source, MIN(bucket) lo, MAX(bucket) hi FROM r GROUP BY source),
grid AS (
  SELECT b.source, unnest(generate_series(b.lo, b.hi, INTERVAL 1 MINUTE)) AS bucket
  FROM bounds b),
j AS (
  SELECT grid.source, grid.bucket,
         r.n_rows, r.sum_tok, r.min_tok, r.max_tok, r.mean_tok,
         (r.bucket IS NULL) AS filled
  FROM grid LEFT JOIN r ON r.source = grid.source AND r.bucket = grid.bucket),
f AS (
  SELECT *,
    epoch_us(bucket) AS t,
    last_value(CASE WHEN NOT filled THEN epoch_us(bucket) END IGNORE NULLS)
      OVER wprev AS t0,
    first_value(CASE WHEN NOT filled THEN epoch_us(bucket) END IGNORE NULLS)
      OVER wnext AS t1,
    {prev},
    {nxt}
  FROM j
  WINDOW wprev AS (PARTITION BY source ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wnext AS (PARTITION BY source ORDER BY bucket
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT source, bucket,
  COALESCE(n_rows, 0) AS n_rows,
  CASE WHEN NOT filled THEN sum_tok
       ELSE CAST(round_even({interp('sum_tok')}, 0) AS BIGINT) END AS sum_tok,
  CASE WHEN NOT filled THEN min_tok
       ELSE CAST(CAST(round_even({interp('min_tok')}, 0) AS BIGINT)
            AS INTEGER) END AS min_tok,
  CASE WHEN NOT filled THEN max_tok
       ELSE CAST(CAST(round_even({interp('max_tok')}, 0) AS BIGINT)
            AS INTEGER) END AS max_tok,
  CASE WHEN NOT filled THEN mean_tok
       ELSE {interp('mean_tok')} END AS mean_tok,
  filled,
  CASE WHEN filled THEN 'linear' ELSE 'none' END AS fill_kind
FROM f
"""
    )


GAPFILL_LINEAR_SQL = _gapfill_linear_sql()


# ---------------------------------------------------------------------------
# seasonal hour-of-day baseline anomaly ratio
# ---------------------------------------------------------------------------


def q_seasonal_hour_baseline(sf_dir):
    """Seasonal-baseline anomaly signal: each (type, day, hour-of-day)
    cell's value total compared to the expanding mean of the SAME hour on
    all PRIOR days — the metrics-store "is today's 3pm unusual for a 3pm"
    question (generalizes the diurnal profile to a causal, point-in-time
    baseline; no future data leaks into the denominator).

    Scale shape: per-(type, day, hod) int64 partials tree-merge (state
    bounded by series x days x 24); the expanding prior-sum scan runs
    per (type, hod) series inside a grouped apply with a vectorized
    segment cumsum — the cumulative_bucket_agg discipline. The single
    float ratio derives once per row as (v * prior_cnt) / prior_sum from
    identical int64 operands on both sides."""
    import pandas as pd

    from mimirsbrunn_ray.stages.rollup import tree_merge

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(pc.is_valid(b["event_type"]), pc.is_valid(b["ts"])),
                pc.is_valid(b["value"]),
            )
        )
        v_e2 = pc.round(pc.multiply(b["value"], pa.scalar(100.0))).cast(pa.int64())
        t = pa.table(
            {
                "event_type": b["event_type"],
                "day": pc.floor_temporal(b["ts"], unit="day"),
                "hod": pc.hour(b["ts"]).cast(pa.int64()),
                "v_e2": v_e2,
            }
        )
        g = t.group_by(["event_type", "day", "hod"]).aggregate([("v_e2", "sum")])
        return g.rename_columns(["event_type", "day", "hod", "v_e2"])

    grain = tree_merge(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
        ).map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["event_type", "day", "hod"])
        .aggregate([("v_e2", "sum")])
        .rename_columns(["event_type", "day", "hod", "v_e2"]),
    )

    def per_series(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["event_type", "hod", "day"], kind="mergesort").reset_index(
            drop=True
        )
        v = g["v_e2"].to_numpy(np.int64)
        new_seg = ~(
            g["event_type"].eq(g["event_type"].shift())
            & g["hod"].eq(g["hod"].shift())
        ).to_numpy()
        seg_id = np.cumsum(new_seg) - 1
        starts = np.flatnonzero(new_seg)
        cs = np.cumsum(v)
        base = np.where(starts > 0, cs[starts - 1], 0)[seg_id]
        prior_sum = cs - v - base
        prior_cnt = np.arange(len(g)) - starts[seg_id]
        keep = (prior_cnt >= 1) & (prior_sum != 0)
        out = pd.DataFrame(
            {
                "event_type": g["event_type"],
                "day": g["day"].astype("datetime64[us]"),
                "hod": g["hod"],
                "v_e2": v,
                "prior_sum_e2": prior_sum,
                "prior_cnt": prior_cnt.astype(np.int64),
            }
        )[keep]
        out["ratio"] = (
            out["v_e2"].to_numpy(np.float64) * out["prior_cnt"].to_numpy(np.float64)
        ) / out["prior_sum_e2"].to_numpy(np.float64)
        return out

    return grain.groupby("event_type").map_groups(per_series, batch_format="pandas")


SEASONAL_BASELINE_SQL = """
WITH h AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v_e2
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2, 3
), w AS (
  SELECT *,
    CAST(COALESCE(SUM(v_e2) OVER (PARTITION BY event_type, hod ORDER BY day
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS prior_sum_e2,
    CAST(COUNT(*) OVER (PARTITION BY event_type, hod ORDER BY day
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT)
      AS prior_cnt
  FROM h
)
SELECT event_type, day, hod, v_e2, prior_sum_e2, prior_cnt,
       (CAST(v_e2 AS DOUBLE) * CAST(prior_cnt AS DOUBLE))
         / CAST(prior_sum_e2 AS DOUBLE) AS ratio
FROM w WHERE prior_cnt >= 1 AND prior_sum_e2 <> 0
"""


# ---------------------------------------------------------------------------
# per-node triangle counting over the dependency edge set
# ---------------------------------------------------------------------------


def q_part_triangles(sf_dir):
    """Per-node triangle counts over the same deterministic dependency
    edge set as ``part_dep_closure`` (k -> k//2, k -> k//3), treated as an
    undirected graph — the graph-analytics sibling of the closure and
    PageRank operators (3-way self-join in SQL).

    Scale shape: the compact-forward algorithm — edges oriented low->high,
    each triangle a<b<c found EXACTLY once at edge (a,b) as
    c in N(a) n N(b). The oriented adjacency (CSR) and the sorted packed
    edge-key array broadcast once (dimension-scale, the documented
    dependency_closure assumption); the edge Dataset partitions across the
    pool, and each batch counts its edges' triangles with zero Python
    loops: candidates expand by np.repeat over CSR degrees and membership
    resolves by ONE searchsorted against the packed edge keys. Per-node
    partial counts (np.bincount over the three corners) tree-merge."""
    import ray as _ray

    from mimirsbrunn_ray.context import pool_size
    from mimirsbrunn_ray.stages.rollup import tree_merge

    part = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey"])
    _mx_raw = part.max("p_partkey")
    mx = int(_mx_raw) if _mx_raw is not None else 0
    ks = np.arange(2, mx + 1, dtype=np.int64)
    src = np.concatenate([ks, ks[ks >= 3]])
    dst = np.concatenate([ks // 2, ks[ks >= 3] // 3])
    keep = (src != dst) & (np.minimum(src, dst) >= 1)
    u = np.minimum(src, dst)[keep]
    v = np.maximum(src, dst)[keep]
    K = np.int64(mx + 2)
    packed = np.unique(u * K + v)  # sorted + dedup'd oriented edges
    eu, ev = packed // K, packed % K
    # CSR over u (edges are already sorted by (u, v) via the packed sort)
    indptr = np.zeros(mx + 2, dtype=np.int64)
    np.add.at(indptr, eu + 1, 1)
    indptr = np.cumsum(indptr)
    adj_ref = _ray.put((packed, indptr, ev))

    n_part = max(8, pool_size())
    edges = rd.from_arrow(
        pa.table({"u": pa.array(eu), "v": pa.array(ev)})
    ).repartition(n_part)

    def tri_partial(b: pa.Table) -> pa.Table:
        pk, ptr, nbr = _ray.get(adj_ref)
        bu = b["u"].to_numpy()
        bv = b["v"].to_numpy()
        deg = ptr[bu + 1] - ptr[bu]
        # candidate ws: every forward neighbor of u, per edge — flat CSR
        # gather with the repeat-offset trick (no per-edge Python loop)
        row = np.repeat(np.arange(len(bu)), deg)
        within = np.arange(len(row)) - np.repeat(np.cumsum(deg) - deg, deg)
        w = nbr[np.repeat(ptr[bu], deg) + within]
        vv = bv[row]
        cand = w > vv  # orientation: count each triangle at its (a,b) edge
        vv, w, uu = vv[cand], w[cand], bu[row][cand]
        probe = vv * K + w
        pos = np.searchsorted(pk, probe)
        pos = np.clip(pos, 0, len(pk) - 1)
        hit = pk[pos] == probe
        corners = np.concatenate([uu[hit], vv[hit], w[hit]])
        if len(corners) == 0:
            return pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "n_triangles": pa.array([], pa.int64()),
                }
            )
        nodes, counts = np.unique(corners, return_counts=True)
        return pa.table(
            {
                "node": pa.array(nodes),
                "n_triangles": pa.array(counts.astype(np.int64)),
            }
        )

    out = tree_merge(
        edges.map_batches(tri_partial, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["node"])
        .aggregate([("n_triangles", "sum")])
        .rename_columns(["node", "n_triangles"]),
    ).materialize()
    if out.count() == 0:
        return pa.table(
            {
                "node": pa.array([], pa.int64()),
                "n_triangles": pa.array([], pa.int64()),
            }
        )
    return out.sort("node")


PART_TRIANGLES_SQL = """
WITH ks AS (SELECT CAST(p_partkey AS BIGINT) AS k FROM part WHERE p_partkey >= 2),
edges0 AS (
  SELECT k AS a, k // 2 AS b FROM ks
  UNION
  SELECT k, k // 3 FROM ks WHERE k >= 3
),
e AS (
  SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v
  FROM edges0 WHERE a <> b AND LEAST(a, b) >= 1
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1 JOIN e e2 ON e2.u = e1.v
  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
),
nodes AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM nodes GROUP BY 1
"""


# ---------------------------------------------------------------------------
# pairwise correlation matrix between event-type hourly series
# ---------------------------------------------------------------------------


def q_type_correlation_matrix(sf_dir):
    """Pearson correlation between every PAIR of event types' hourly-sum
    series over the completed hour grid (absent hours are 0, the chi2
    completion rule) — the cross-series co-movement matrix a metrics
    store derives for alerting ("these two signals always spike
    together").

    Scale shape: one per-(type, hour) int64 partial pass tree-merges to a
    |types| x |hours| grain; ALL pairwise moments then come from a single
    int64 matmul M^T M on the densified grid (exact: hourly sums bounded
    well under the 2^63 product headroom) — no per-pair shuffle, no
    self-join of the event stream. The Pearson derivation runs once per
    pair from identical int64 moments on both sides, term-for-term in
    double."""
    from mimirsbrunn_ray.stages.rollup import tree_merge

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(pc.is_valid(b["event_type"]), pc.is_valid(b["ts"])),
                pc.is_valid(b["value"]),
            )
        )
        v_e2 = pc.round(pc.multiply(b["value"], pa.scalar(100.0))).cast(pa.int64())
        t = pa.table(
            {
                "t": b["event_type"],
                "b": pc.floor_temporal(b["ts"], unit="hour"),
                "v": v_e2,
            }
        )
        g = t.group_by(["t", "b"]).aggregate([("v", "sum")])
        return g.rename_columns(["t", "b", "v"])

    merged = tree_merge(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
        ).map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["t", "b"])
        .aggregate([("v", "sum")])
        .rename_columns(["t", "b", "v"]),
    )

    def finish(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "type_a": pa.array([], pa.string()),
                "type_b": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "corr": pa.array([], pa.float64()),
            }
        )
        if b.num_rows == 0:
            return empty
        types, t_idx = np.unique(
            b["t"].to_numpy(zero_copy_only=False), return_inverse=True
        )
        hours, h_idx = np.unique(b["b"].to_numpy(), return_inverse=True)
        M = np.zeros((len(hours), len(types)), dtype=np.int64)
        M[h_idx, t_idx] = b["v"].to_numpy()
        S = M.T @ M  # exact int64 pairwise cross-moments
        col = M.sum(axis=0)
        n = np.int64(len(hours))
        ia, ib = np.triu_indices(len(types), k=1)
        nd = np.float64(n)
        sa, sb = col[ia].astype(np.float64), col[ib].astype(np.float64)
        sab = S[ia, ib].astype(np.float64)
        saa = S[ia, ia].astype(np.float64)
        sbb = S[ib, ib].astype(np.float64)
        var_a = nd * saa - sa * sa
        var_b = nd * sbb - sb * sb
        keep = (var_a > 0) & (var_b > 0)
        corr = (nd * sab - sa * sb)[keep] / (
            np.sqrt(var_a[keep]) * np.sqrt(var_b[keep])
        )
        if not keep.any():
            return empty
        return pa.table(
            {
                "type_a": pa.array(types[ia[keep]], pa.string()),
                "type_b": pa.array(types[ib[keep]], pa.string()),
                "n": pa.array(np.full(int(keep.sum()), n)),
                "corr": pa.array(corr, pa.float64()),
            }
        )

    return merged.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None
    )


TYPE_CORR_SQL = """
WITH h AS (
  SELECT event_type AS t, date_trunc('hour', ts) AS b,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
), bk AS (SELECT DISTINCT b FROM h), ty AS (SELECT DISTINCT t FROM h),
g AS (
  SELECT bk.b, ty.t, COALESCE(h.v, 0) AS v
  FROM bk CROSS JOIN ty LEFT JOIN h ON h.b = bk.b AND h.t = ty.t
), p AS (
  SELECT a.t AS type_a, c.t AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(a.v) AS BIGINT) AS sa, CAST(SUM(c.v) AS BIGINT) AS sb,
         CAST(SUM(a.v * c.v) AS BIGINT) AS sab,
         CAST(SUM(a.v * a.v) AS BIGINT) AS saa,
         CAST(SUM(c.v * c.v) AS BIGINT) AS sbb
  FROM g a JOIN g c ON a.b = c.b AND a.t < c.t
  GROUP BY 1, 2
)
SELECT type_a, type_b, n,
       (CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
          - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
       / (sqrt(CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
               - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
          * sqrt(CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
                 - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))) AS corr
FROM p
WHERE (CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
       - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) > 0
  AND (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
       - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)) > 0
"""


# ---------------------------------------------------------------------------
# exact weighted quantiles (mass cut-points)
# ---------------------------------------------------------------------------

_WQ_PCTS = (50, 90, 99)


def q_weighted_char_quantiles(sf_dir):
    """Exact WEIGHTED quantiles of document length, weight = the length
    itself: the smallest length L such that documents of length <= L hold
    at least q% of ALL characters — the curation cut "how short can I
    truncate and keep 90% of the corpus mass".

    Scale shape: the answer depends only on the (length -> total weight)
    HISTOGRAM, so one decomposable count pass tree-merges a table bounded
    by the length domain; the driver walk compares int64 cumulative
    weights against the integer threshold ceil(q*W/100) — no sort
    shuffle, no float mass fractions anywhere."""
    from mimirsbrunn_ray.stages.rollup import tree_merge

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["n_chars"]))
        x = b["n_chars"].cast(pa.int64())
        t = pa.table({"x": x, "w": x})
        g = t.group_by(["x"]).aggregate([("w", "sum")])
        return g.rename_columns(["x", "w"])

    merged = tree_merge(
        rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["n_chars"]
        ).map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["x"])
        .aggregate([("w", "sum")])
        .rename_columns(["x", "w"]),
    )

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "q_pct": pa.array([], pa.int64()),
                    "x_cut": pa.array([], pa.int64()),
                    "total_w": pa.array([], pa.int64()),
                }
            )
        order = pc.sort_indices(b["x"])
        x = b["x"].take(order).to_numpy()
        w = b["w"].take(order).to_numpy()
        cw = np.cumsum(w)
        W = int(cw[-1])
        qs, cuts = [], []
        for q in _WQ_PCTS:
            thr = (W * q + 99) // 100  # ceil(q*W/100), pure ints
            j = int(np.searchsorted(cw, thr, side="left"))
            qs.append(q)
            cuts.append(int(x[min(j, len(x) - 1)]))
        return pa.table(
            {
                "q_pct": pa.array(qs, pa.int64()),
                "x_cut": pa.array(cuts, pa.int64()),
                "total_w": pa.array([W] * len(qs), pa.int64()),
            }
        )

    return merged.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None
    )


_WQ_UNION = " UNION ALL ".join(f"SELECT {q} AS q_pct" for q in _WQ_PCTS)

WEIGHTED_QUANTILES_SQL = f"""
WITH d AS (
  SELECT CAST(n_chars AS BIGINT) AS x, CAST(n_chars AS BIGINT) AS w
  FROM documents WHERE n_chars IS NOT NULL
), c AS (SELECT x, CAST(SUM(w) AS BIGINT) AS wx FROM d GROUP BY 1),
cum AS (
  SELECT x, CAST(SUM(wx) OVER (ORDER BY x) AS BIGINT) AS cw FROM c
), tot AS (SELECT CAST(SUM(w) AS BIGINT) AS W FROM d),
qs AS ({_WQ_UNION})
SELECT qs.q_pct,
       CAST(MIN(cum.x) AS BIGINT) AS x_cut,
       (SELECT W FROM tot) AS total_w
FROM qs JOIN cum ON cum.cw >= ((SELECT W FROM tot) * qs.q_pct + 99) // 100
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# keyed interval-overlap join (intervals x intervals, not point-in-window)
# ---------------------------------------------------------------------------

_IVL_GRAIN_US = 600_000_000  # 10 min >= both interval widths -> <=2 buckets


def q_interval_overlap_join(sf_dir):
    """TRUE interval x interval overlap join, keyed by user: every
    (error-window, purchase-window) pair of the SAME user whose intervals
    intersect — error windows [ts, ts+10m), purchase windows [ts-5m,
    ts+5m). Complements the point-in-interval join
    (clicks_in_error_windows) with the two-sided case.

    Scale shape: each interval lands in every 10-min grid bucket it
    touches (grain >= interval width -> replication factor <= 2); ONE
    equi-join on (user, bucket) replaces the quadratic range predicate;
    a pair is emitted ONLY in the bucket containing max(start_a, start_b)
    — a bucket both sides share whenever they overlap — so no
    dedup shuffle ever runs. Overlap length derives from int64 epoch-us
    on both sides."""
    from mimirsbrunn_ray.context import pool_size

    def side(event_type: str, lo_off: int, hi_off: int, id_name: str):
        def expand(b: pa.Table) -> pa.Table:
            b = b.filter(
                pc.and_(
                    pc.and_(
                        pc.equal(b["event_type"], event_type),
                        pc.is_valid(b["user_id"]),
                    ),
                    pc.is_valid(b["ts"]),
                )
            )
            t64 = b["ts"].cast(pa.int64()).to_numpy()
            s = t64 + lo_off
            e = t64 + hi_off
            uid = b["user_id"].to_numpy()
            eid = b["event_id"].to_numpy()
            b1 = s // _IVL_GRAIN_US
            b2 = (e - 1) // _IVL_GRAIN_US
            extra = b2 != b1
            bucket = np.concatenate([b1, b2[extra]])
            rep = lambda a: np.concatenate([a, a[extra]])  # noqa: E731
            return pa.table(
                {
                    "user_id": pa.array(rep(uid)),
                    "bucket": pa.array(bucket),
                    id_name: pa.array(rep(eid)),
                    f"{id_name}_s": pa.array(rep(s)),
                    f"{id_name}_e": pa.array(rep(e)),
                }
            )

        return rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "user_id", "event_type"],
        ).map_batches(expand, batch_format="pyarrow", batch_size=None)

    a = side("error", 0, 600_000_000, "error_id")
    b = side("purchase", -300_000_000, 300_000_000, "purchase_id")

    n_part = max(8, pool_size())
    joined = _safe_join(
        a, b,
        on=("user_id", "bucket",),
        join_type="inner",
        num_partitions=n_part,
    )

    def finish(t: pa.Table) -> pa.Table:
        sa = t["error_id_s"].to_numpy()
        ea = t["error_id_e"].to_numpy()
        sb = t["purchase_id_s"].to_numpy()
        eb = t["purchase_id_e"].to_numpy()
        bucket = t["bucket"].to_numpy()
        meet = np.maximum(sa, sb)
        keep = (sa < eb) & (sb < ea) & (meet // _IVL_GRAIN_US == bucket)
        t = t.filter(pa.array(keep))
        return pa.table(
            {
                "user_id": t["user_id"],
                "error_id": t["error_id"],
                "purchase_id": t["purchase_id"],
                "overlap_us": pa.array(
                    np.minimum(ea, eb)[keep] - meet[keep], pa.int64()
                ),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow", batch_size=None)


INTERVAL_OVERLAP_SQL = """
WITH a AS (
  SELECT event_id AS error_id, user_id,
         epoch_us(ts) AS s, epoch_us(ts) + 600000000 AS e
  FROM events
  WHERE event_type = 'error' AND user_id IS NOT NULL AND ts IS NOT NULL
), b AS (
  SELECT event_id AS purchase_id, user_id,
         epoch_us(ts) - 300000000 AS s, epoch_us(ts) + 300000000 AS e
  FROM events
  WHERE event_type = 'purchase' AND user_id IS NOT NULL AND ts IS NOT NULL
)
SELECT a.user_id, a.error_id, b.purchase_id,
       CAST(LEAST(a.e, b.e) - GREATEST(a.s, b.s) AS BIGINT) AS overlap_us
FROM a JOIN b ON a.user_id = b.user_id AND a.s < b.e AND b.s < a.e
"""


def register_r4c(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "tpch_q17_small_qty": q_tpch_q17_small_qty,
            "m4_downsample": q_m4_downsample,
            "inverted_postings": q_inverted_postings,
            "histogram_quantile_p95": q_histogram_quantile,
            "tpch_q4_priority": q_tpch_q4_priority,
            "exclusive_supplier_orders": q_exclusive_supplier_orders,
            "idle_rich_customers": q_idle_rich_customers,
            "gapfill_linear_1m": q_gapfill_linear_1m,
            "seasonal_hour_baseline": q_seasonal_hour_baseline,
            "part_triangles": q_part_triangles,
            "type_correlation_matrix": q_type_correlation_matrix,
            "weighted_char_quantiles": q_weighted_char_quantiles,
            "interval_overlap_join": q_interval_overlap_join,
        }
    )
    oracles.update(
        {
            "tpch_q17_small_qty": TPCH_Q17_SQL,
            "m4_downsample": M4_SQL,
            "inverted_postings": POSTINGS_SQL,
            "histogram_quantile_p95": HISTOGRAM_QUANTILE_SQL,
            "tpch_q4_priority": TPCH_Q4_SQL,
            "exclusive_supplier_orders": EXCLUSIVE_SUPPLIER_SQL,
            "idle_rich_customers": IDLE_RICH_SQL,
            "gapfill_linear_1m": GAPFILL_LINEAR_SQL,
            "seasonal_hour_baseline": SEASONAL_BASELINE_SQL,
            "part_triangles": PART_TRIANGLES_SQL,
            "type_correlation_matrix": TYPE_CORR_SQL,
            "weighted_char_quantiles": WEIGHTED_QUANTILES_SQL,
            "interval_overlap_join": INTERVAL_OVERLAP_SQL,
        }
    )

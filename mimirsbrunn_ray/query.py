"""Read API over published tiers — the bragi query-layer graft.

Route mapping (SURVEY.md §2.10):
  /autocomplete  -> ``top_k``: tier scan with predicate pushdown + top-k
  /reverse       -> ``as_of``: the bucket covering a timestamp (backward
                    fill to the nearest earlier bucket, top-1 proximity)
  /features/{id} -> ``lookup_id``: exact key lookup, None if absent
  /status        -> ``status``: manifest counters per tier

All reads go through LATEST.json -> a fully committed run dir (the alias
indirection, /root/reference/libs/mimir/src/rubber.rs:254-300), with
column pruning and parquet row-group predicate pushdown at the read.
"""

from __future__ import annotations

import functools
import time
from collections import defaultdict, deque

import numpy as np
import pandas as pd
import pyarrow.compute as pc
import pyarrow.dataset as pads

from mimirsbrunn_ray.functions.timeutil import BUCKET_US, trunc_us
from mimirsbrunn_ray.state.manifest import read_manifest
from mimirsbrunn_ray.state.publish import TierStore


def _tier_dataset(store: TierStore, tier: str) -> "pads.Dataset":
    return pads.dataset(store.latest_data_paths(tier))


# ---------------------------------------------------------------------------
# Per-route latency histograms — the Prometheus middleware graft
# (/root/reference/libs/bragi/src/prometheus_middleware.rs): every route
# records its wall time into a bounded reservoir; ``status()`` reports
# count / quantiles per route.
# ---------------------------------------------------------------------------

_LATENCY_WINDOW = 4096
_route_timings: dict[str, deque] = defaultdict(
    lambda: deque(maxlen=_LATENCY_WINDOW)
)
_route_counts: dict[str, int] = defaultdict(int)


def _timed_route(fn):
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        try:
            return fn(*args, **kwargs)
        finally:
            _route_timings[fn.__name__].append(time.perf_counter() - t0)
            _route_counts[fn.__name__] += 1

    return wrapper


def latency_stats() -> dict:
    """count + p50/p90/p99/max seconds per exercised route (quantiles over
    the last ``_LATENCY_WINDOW`` calls; count is all-time)."""
    out = {}
    for route, samples in _route_timings.items():
        arr = np.sort(np.asarray(samples, dtype=np.float64))
        if len(arr) == 0:
            continue
        pick = lambda q: float(arr[min(len(arr) - 1, int(q * len(arr)))])  # noqa: E731
        out[route] = {
            "count": _route_counts[route],
            "p50_s": pick(0.50),
            "p90_s": pick(0.90),
            "p99_s": pick(0.99),
            "max_s": float(arr[-1]),
        }
    return out


def reset_latency_stats() -> None:
    _route_timings.clear()
    _route_counts.clear()


@_timed_route
def top_k(
    store: TierStore,
    tier: str = "1m",
    metric: str = "sum_tok",
    k: int = 10,
    offset: int = 0,
    source: str | None = None,
    descending: bool = True,
    fallback_unfiltered: bool = True,
    debug: bool = False,
) -> pd.DataFrame:
    """Top-k buckets by a metric (default page size 10 like bragi's
    autocomplete limit, /root/reference/libs/bragi/src/routes/autocomplete.rs:56-58;
    ``offset`` grafts bragi's from/size paging, same file :71-73).

    Two-pass orchestration graft (query.rs:667-714: exact prefix first,
    fuzzy fallback iff ZERO results): when the source-filtered scan returns
    nothing and ``fallback_unfiltered``, retry without the source filter.

    ``debug=True`` adds an ``explain`` column — the per-result component
    breakdown of the reference's ``_debug`` -> ES explain tree
    (/root/reference/libs/mimir/src/objects.rs:958-976): which metric was
    ranked, its raw value, the per-bucket mean that value decomposes into,
    and whether the relaxed second pass produced the row.
    """

    def scan(src):
        filt = pc.field("filled") == False  # noqa: E712 — pushdown expression
        if src is not None:
            filt = filt & (pc.field("source") == src)
        return _tier_dataset(store, tier).to_table(
            columns=["source", "bucket", metric, "n_rows"], filter=filt
        )

    tbl = scan(source)
    relaxed = False
    if tbl.num_rows == 0 and source is not None and fallback_unfiltered:
        tbl = scan(None)  # pass 2: relaxed
        relaxed = True
    df = tbl.to_pandas().sort_values(
        [metric, "source", "bucket"], ascending=[not descending, True, True]
    )
    page = df.iloc[offset : offset + k].reset_index(drop=True)
    if debug:
        page = page.assign(
            explain=[
                {
                    "metric": metric,
                    "value": float(r[metric]),
                    "n_rows": int(r["n_rows"]),
                    "mean_per_row": float(r[metric]) / max(int(r["n_rows"]), 1),
                    "relaxed_pass": relaxed,
                }
                for r in page.to_dict("records")
            ]
        )
    return page


@_timed_route
def top_k_scored(
    store: TierStore,
    tier: str = "1m",
    metric: str = "sum_tok",
    k: int = 10,
    offset: int = 0,
    source: str | None = None,
    weights: dict | None = None,
    debug: bool = False,
) -> pd.DataFrame:
    """``top_k`` with PER-REQUEST scoring-weight overrides — the
    query_settings graft (/root/reference/libs/bragi/src/query_settings.rs:1-84
    lets each request override proximity scale/offset/decay; here each
    request may override how the ranked score composes):

      score = metric_scale * value
              + recency_scale * zoom_decay(age_buckets / recency_decay)

    with ``weights`` keys ``metric_scale`` (default 1.0),
    ``recency_scale`` (default 0.0 — pure metric ranking, identical to
    ``top_k`` order) and ``recency_decay`` (buckets, default 1440).
    ``age_buckets`` counts back from the tier's newest bucket. Ties break
    (source, bucket) ascending like ``top_k``."""
    import numpy as np

    from mimirsbrunn_ray.functions.scoring import zoom_decay
    from mimirsbrunn_ray.functions.timeutil import BUCKET_US as _BU

    w = {"metric_scale": 1.0, "recency_scale": 0.0,
         "recency_decay": 1440.0}
    w.update(weights or {})
    filt = pc.field("filled") == False  # noqa: E712
    if source is not None:
        filt = filt & (pc.field("source") == source)
    tbl = _tier_dataset(store, tier).to_table(
        columns=["source", "bucket", metric, "n_rows"], filter=filt
    )
    df = tbl.to_pandas()
    if len(df) == 0:
        return df
    b_us = df["bucket"].astype("datetime64[us]").astype(np.int64)
    age = (int(b_us.max()) - b_us.to_numpy()) / _BU[_gran_of(tier)]
    score = (
        float(w["metric_scale"]) * df[metric].to_numpy(np.float64)
        + float(w["recency_scale"])
        * zoom_decay(age / max(float(w["recency_decay"]), 1e-9))
    )
    df = df.assign(score=score).sort_values(
        ["score", "source", "bucket"], ascending=[False, True, True]
    )
    page = df.iloc[offset: offset + k].reset_index(drop=True)
    if debug:
        page = page.assign(
            explain=[
                {"metric": metric, "value": float(r[metric]),
                 "score": float(r["score"]), "weights": dict(w)}
                for r in page.to_dict("records")
            ]
        )
    return page


@_timed_route
def lookup_id(
    store: TierStore, doc_id: str, lang: str | None = None
) -> dict | None:
    """Exact-id lookup in the raw tier (features/{id}; 404 -> None).
    ``lang`` shapes the response per request language when the row carries
    a ``names`` map column (the I18nProperties selection,
    /root/reference/libs/bragi/src/model.rs:144-168)."""
    from mimirsbrunn_ray.functions.i18n import localized_row

    tbl = _tier_dataset(store, "raw").to_table(
        filter=pc.field("doc_id") == doc_id
    )
    if tbl.num_rows == 0:
        return None
    return localized_row(tbl.slice(0, 1).to_pylist()[0], lang)


@_timed_route
def as_of(
    store: TierStore, source: str, ts_us: int, tier: str = "1m"
) -> dict | None:
    """The rollup row whose bucket covers ``ts_us`` for ``source``; if that
    bucket is absent, the nearest EARLIER bucket (reverse-geocode top-1 /
    LOCF semantics)."""
    import numpy as np

    bucket_us = int(trunc_us(np.array([ts_us]), _gran_of(tier))[0])
    tbl = _tier_dataset(store, tier).to_table(
        filter=(pc.field("source") == source)
    )
    if tbl.num_rows == 0:
        return None
    b = tbl["bucket"].cast("int64").to_numpy(zero_copy_only=False)
    mask = b <= bucket_us
    if not mask.any():
        return None
    idx = int(np.argmax(np.where(mask, b, np.iinfo("int64").min)))
    return tbl.slice(idx, 1).to_pylist()[0]


def _gran_of(tier: str) -> str:
    assert tier in BUCKET_US
    return tier


def status(store: TierStore, tiers=("raw", "1m", "1h", "1d", "compressed")) -> dict:
    """Run-manifest counters per tier + per-route latency histograms (the
    /status + /metrics analog; timing quantiles graft the Prometheus
    middleware, /root/reference/libs/bragi/src/prometheus_middleware.rs)."""
    out = {"latency": latency_stats()}
    for tier in tiers:
        run_dir = store.latest_run_dir(tier)
        if run_dir is None:
            out[tier] = {"committed": False}
            continue
        m = read_manifest(run_dir)
        out[tier] = {
            "committed": m["committed"],
            "run_id": m["run_id"],
            "rows_out": m["rows_out"],
            "bytes_out": m["bytes_out"],
            "counters": m.get("counters", {}),
        }
    return out


def decompressed_series(store: TierStore, source: str) -> pd.DataFrame:
    """Decode the compressed tier back to (bucket, value) — query-side proof
    that the Gorilla/DoD blocks are self-sufficient."""
    import numpy as np

    from mimirsbrunn_ray.stages.compress import decompress_block

    tbl = _tier_dataset(store, "compressed").to_table(
        filter=pc.field("source") == source
    )
    ts_all, vals_all = [], []
    for row in tbl.to_pylist():
        ts, vals = decompress_block(row["ts_dod"], row["val_gorilla"])
        ts_all.append(ts)
        vals_all.append(vals)
    if not ts_all:
        return pd.DataFrame(columns=["bucket_us", "value"])
    ts = np.concatenate(ts_all)
    vals = np.concatenate(vals_all)
    order = np.argsort(ts, kind="stable")
    return pd.DataFrame({"bucket_us": ts[order], "value": vals[order]})

"""HTTP daemon routes over a real socket (VERDICT r4 item 5): the four
bragi-analog routes — /autocomplete (with per-request weight overrides),
/features/<id>, /reverse, /status — served from a published tier store,
asserted against the library calls they wrap."""

from __future__ import annotations

import json
import urllib.request

import pytest


@pytest.fixture(scope="module")
def server(tier_root):
    from mimirsbrunn_ray.service import start_background

    srv, port = start_background(tier_root, port=0)
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def _get(url: str):
    try:
        with urllib.request.urlopen(url, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_autocomplete_matches_library_topk(server, tier_root):
    from mimirsbrunn_ray import query as q
    from mimirsbrunn_ray.state.publish import TierStore

    code, body = _get(f"{server}/autocomplete?k=5")
    assert code == 200
    assert body["type"] == "FeatureCollection"
    feats = body["features"]
    assert len(feats) == 5
    lib = q.top_k(TierStore(tier_root), k=5)
    got = [(f["properties"]["source"], f["properties"]["sum_tok"])
           for f in feats]
    exp = list(zip(lib["source"], (int(v) for v in lib["sum_tok"])))
    assert [(s, int(v)) for s, v in got] == [(s, int(v)) for s, v in exp]


def test_autocomplete_weight_override_changes_ranking(server):
    code, base = _get(f"{server}/autocomplete?k=50&metric_scale=1")
    assert code == 200
    # heavy recency weighting, metric muted: ranking must differ from the
    # pure-metric order (query_settings per-request override semantics)
    code, recency = _get(
        f"{server}/autocomplete?k=50&metric_scale=0"
        "&recency_scale=1000&recency_decay=10")
    assert code == 200
    base_keys = [(f["properties"]["source"], f["properties"]["bucket"])
                 for f in base["features"]]
    rec_keys = [(f["properties"]["source"], f["properties"]["bucket"])
                for f in recency["features"]]
    assert base_keys != rec_keys
    # scored route exposes the per-request weights in debug explain
    code, dbg = _get(
        f"{server}/autocomplete?k=1&debug=1&recency_scale=0.5")
    assert code == 200
    exp = dbg["features"][0]["properties"]["explain"]
    assert exp["weights"]["recency_scale"] == 0.5


def test_features_route_found_and_404(server, tier_root, corpus):
    from mimirsbrunn_ray import query as q
    from mimirsbrunn_ray.state.publish import TierStore

    some = q.top_k(TierStore(tier_root), tier="1m", k=1)
    # fetch a real doc_id from the raw tier via the library
    import pyarrow.dataset as pads

    store = TierStore(tier_root)
    import glob as _glob

    raw_files = sorted(_glob.glob(f"{tier_root}/raw/run=*/*.parquet"))
    doc_id = pads.dataset(raw_files[0]).head(1)["doc_id"][0].as_py()
    code, body = _get(f"{server}/features/{doc_id}")
    assert code == 200
    assert body["properties"]["doc_id"] == doc_id
    code, body = _get(f"{server}/features/___nope___")
    assert code == 404
    assert body["short"] == "query error"
    del some


def test_reverse_route(server, tier_root):
    from mimirsbrunn_ray import query as q
    from mimirsbrunn_ray.state.publish import TierStore

    store = TierStore(tier_root)
    top = q.top_k(store, k=1)
    src = top["source"][0]
    ts_us = int(top["bucket"].astype("datetime64[us]").astype("int64")[0])
    code, body = _get(f"{server}/reverse?source={src}&ts_us={ts_us}")
    assert code == 200
    assert body["properties"]["source"] == src
    code, _ = _get(f"{server}/reverse?source={src}&ts_us=1")
    assert code == 404


def test_status_route_reports_latency_histograms(server):
    code, body = _get(f"{server}/status")
    assert code == 200
    assert "latency" in body
    # the routes above ran: their histograms must be present
    assert "top_k" in body["latency"] or "top_k_scored" in body["latency"]
    for tier in ("raw", "1m", "1h", "1d", "compressed"):
        assert tier in body

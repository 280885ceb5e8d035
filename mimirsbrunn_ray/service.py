"""HTTP query service — the bragi daemon graft (VERDICT r4 item 5).

The reference's query surface is a long-lived HTTP daemon
(/root/reference/libs/bragi/src/lib.rs:42-51) whose routes
(routes/autocomplete.rs:60-103, routes/features.rs, routes/reverse.rs,
routes/status.rs) accept per-request parameter overrides
(routes/autocomplete.rs:158-168, query_settings.rs:1-84). This module is
the Ray-side analog: a stdlib ThreadingHTTPServer over the published
tier store — serving is driver-side metadata + pushdown-filtered reads
of the committed tiers (query.py), never a cluster job per request.

Routes (all GET, JSON responses):
  /autocomplete?tier=&metric=&k=&offset=&source=&debug=
      &metric_scale=&recency_scale=&recency_decay=
      -> geocodejson-shaped FeatureCollection of top-k buckets; any of
      the three weight params switches to the per-request-scored ranking
      (query.top_k_scored), mirroring query_settings overrides.
  /features/<doc_id>?lang=   -> single feature or 404 (bragi features/{id}).
  /reverse?source=&ts_us=&tier=  -> covering-or-earlier bucket (as_of).
  /status  -> per-tier manifests + per-route latency histograms.

Run via ``python -m mimirsbrunn_ray.cli serve --root <tier_root> --port N``
or ``serve_forever()`` / ``start_background()`` below.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from mimirsbrunn_ray.state.publish import TierStore

_WEIGHT_KEYS = ("metric_scale", "recency_scale", "recency_decay")


def _jsonable(v):
    import numpy as np
    import pandas as pd

    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    import datetime

    if isinstance(v, (pd.Timestamp, datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    if isinstance(v, bytes):
        return v.hex()
    try:
        import numpy as np

        if isinstance(v, np.ndarray):
            return [_jsonable(x) for x in v.tolist()]
    except Exception:
        pass
    return v


def _feature_collection(df) -> dict:
    """geocodejson-shaped envelope (bragi model.rs Autocomplete ->
    FeatureCollection; time-series graft: bucket plays the coordinate)."""
    feats = []
    for r in df.to_dict("records"):
        props = {k: _jsonable(v) for k, v in r.items()}
        feats.append({"type": "Feature", "properties": props})
    return {
        "type": "FeatureCollection",
        "geocoding": {"version": "0.1.0", "query": ""},
        "features": feats,
    }


class _Handler(BaseHTTPRequestHandler):
    store: TierStore = None  # set by make_server

    def log_message(self, fmt, *args):  # silence per-request stderr spam
        pass

    def _send(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 — http.server API
        from mimirsbrunn_ray import query as q

        url = urlparse(self.path)
        qs = {k: v[0] for k, v in parse_qs(url.query).items()}
        try:
            if url.path == "/autocomplete":
                weights = {k: float(qs[k]) for k in _WEIGHT_KEYS if k in qs}
                common = dict(
                    tier=qs.get("tier", "1m"),
                    metric=qs.get("metric", "sum_tok"),
                    k=int(qs.get("k", "10")),
                    offset=int(qs.get("offset", "0")),
                    source=qs.get("source"),
                    debug=qs.get("debug", "0") in ("1", "true"),
                )
                if weights:
                    df = q.top_k_scored(self.store, weights=weights,
                                        **common)
                else:
                    df = q.top_k(self.store, **common)
                return self._send(200, _feature_collection(df))
            if url.path.startswith("/features/"):
                doc_id = url.path[len("/features/"):]
                row = q.lookup_id(self.store, doc_id,
                                  lang=qs.get("lang"))
                if row is None:
                    return self._send(
                        404, {"short": "query error",
                              "long": f"id {doc_id!r} not found"})
                return self._send(200, {
                    "type": "Feature",
                    "properties": _jsonable(row),
                })
            if url.path == "/reverse":
                row = q.as_of(
                    self.store, qs["source"], int(qs["ts_us"]),
                    tier=qs.get("tier", "1m"))
                if row is None:
                    return self._send(
                        404, {"short": "query error",
                              "long": "no covering bucket"})
                return self._send(200, {
                    "type": "Feature",
                    "properties": _jsonable(row),
                })
            if url.path == "/status":
                return self._send(200, _jsonable(q.status(self.store)))
            return self._send(404, {"short": "query error",
                                    "long": f"no route {url.path}"})
        except Exception as ex:  # noqa: BLE001 — HTTP boundary
            return self._send(500, {"short": "query error",
                                    "long": str(ex)})


def make_server(tier_root: str, port: int = 0) -> ThreadingHTTPServer:
    handler = type("BoundHandler", (_Handler,),
                   {"store": TierStore(tier_root)})
    return ThreadingHTTPServer(("127.0.0.1", port), handler)


def start_background(tier_root: str, port: int = 0):
    """Start the daemon on a thread; returns (server, actual_port)."""
    srv = make_server(tier_root, port)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, srv.server_address[1]


def serve_forever(tier_root: str, port: int) -> None:
    srv = make_server(tier_root, port)
    print(json.dumps({"serving": tier_root, "port": port}))
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()

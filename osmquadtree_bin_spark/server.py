"""HTTP serving surface over the tiled store — the reference's geometry
server (``/root/reference/osmquadtree-geometry.go:384-550`` route handlers,
``osmquadtree-filter.go`` server mode, embedded Leaflet UI in
``static.go``/``index.html``), re-expressed as a thin stdlib HTTP layer over
``TileQueryEngine``. Serving is a driver-edge concern: every endpoint is a
bounded collect of an already-pruned Spark plan (tile partition pruning +
exact predicates), never a bulk path.

Routes (GET):
    /                           embedded Leaflet viewer (static HTML)
    /status                     store + ledger state (JSON)
    /tile/{z}/{x}/{y}           raw-tile fetch (J8) → GeoJSON
    /bbox?minx&miny&maxx&maxy   pruned bbox scan (P1+P6) → GeoJSON
    /query?sql=…&bbox=…         dialect SQL over the bbox's planet_osm
                                views (§2.8 translate) → JSON rows
    /extract?minx&…             PIP extract + id-set trim (P4/O2) → GeoJSON;
                                &format=parquet downloads the sorted, trimmed
                                extract as ONE re-ingestible parquet artifact
                                (the WritePbfIndexed analogue,
                                ``osmquadtree-filter.go:217``)

Result caching mirrors the reference server exactly: ONE bbox-scan result
plus THREE raw-tile results (``osmquadtree-geometry.go:235-243`` bbox cache,
``:291-298`` tile LRU).

Spark's driver is single-tenant: handler threads serialize engine calls
behind a lock (the reference serves its heavy endpoints through an
equivalent single-flight channel). No egress: binds localhost by default.
"""

from __future__ import annotations

import json
import threading
from collections import OrderedDict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from .sources import to_geojson

BBOX_CACHE_SIZE = 1  # osmquadtree-geometry.go:235-243
TILE_CACHE_SIZE = 3  # osmquadtree-geometry.go:291-298
DEFAULT_LIMIT = 10_000

INDEX_HTML = """<!DOCTYPE html>
<html><head><title>osmquadtree-bin-spark</title>
<link rel="stylesheet" href="https://unpkg.com/leaflet@1.9.4/dist/leaflet.css"/>
<script src="https://unpkg.com/leaflet@1.9.4/dist/leaflet.js"></script>
<style>html,body,#map{height:100%;margin:0}</style></head>
<body><div id="map"></div><script>
var map = L.map('map').setView([51.5, -0.12], 10);
L.tileLayer('https://tile.openstreetmap.org/{z}/{x}/{y}.png',
            {maxZoom: 18, attribution: '&copy; OpenStreetMap'}).addTo(map);
var layer = L.geoJSON(null, {style: {weight: 1}}).addTo(map);
function refresh() {
  var b = map.getBounds(), s = 1e7;
  var u = '/bbox?minx=' + Math.round(b.getWest()*s) +
          '&miny=' + Math.round(b.getSouth()*s) +
          '&maxx=' + Math.round(b.getEast()*s) +
          '&maxy=' + Math.round(b.getNorth()*s);
  fetch(u).then(r => r.json()).then(g => { layer.clearLayers(); layer.addData(g); });
}
map.on('moveend', refresh); refresh();
</script></body></html>"""


class _LRU:
    """Tiny LRU with its own lock: ThreadingHTTPServer handlers call get/put
    concurrently, and at cache sizes 1 and 3 an unguarded
    membership-check-then-move_to_end races a concurrent eviction into a
    KeyError (spurious 500); the hit/miss counters race too."""

    def __init__(self, size: int):
        self.size = size
        self.d: OrderedDict = OrderedDict()
        self.hits = 0
        self.misses = 0
        self._lock = threading.Lock()

    def get(self, key):
        with self._lock:
            if key in self.d:
                self.d.move_to_end(key)
                self.hits += 1
                return self.d[key]
            self.misses += 1
            return None

    def put(self, key, value):
        with self._lock:
            self.d[key] = value
            self.d.move_to_end(key)
            while len(self.d) > self.size:
                self.d.popitem(last=False)


class TileServer:
    """Wraps a TileQueryEngine; ``make_handler()`` yields the request class.

    The engine's Spark calls run single-flight behind ``_lock``; responses
    are rendered driver-side (bounded by ``limit``)."""

    def __init__(self, engine, limit: int = DEFAULT_LIMIT):
        self.engine = engine
        self.limit = limit
        self._lock = threading.Lock()
        self.bbox_cache = _LRU(BBOX_CACHE_SIZE)
        self.tile_cache = _LRU(TILE_CACHE_SIZE)

    # ---------------------------------------------------------- responses
    def page_index(self) -> str:
        return INDEX_HTML

    def page_status(self) -> str:
        import os

        from pyspark.sql import functions as F

        with self._lock:
            n_tiles = len(self.engine.groups)
            ledger_path = os.path.join(
                os.path.dirname(self.engine.store_path.rstrip("/")), "ledger"
            )
            try:
                led = self.engine.spark.read.parquet(ledger_path)
                state = led.agg(F.max("state").alias("s")).collect()[0]["s"]
            except Exception:  # noqa: BLE001 — store without a ledger
                state = None
        return json.dumps(
            {
                "store": self.engine.store_path,
                "n_tiles": int(n_tiles),
                "ledger_state": state,
                "cache": {
                    "bbox": {"hits": self.bbox_cache.hits, "misses": self.bbox_cache.misses},
                    "tile": {"hits": self.tile_cache.hits, "misses": self.tile_cache.misses},
                },
            }
        )

    def page_tile(self, tz: int, tx: int, ty: int) -> str:
        key = (tz, tx, ty)
        cached = self.tile_cache.get(key)
        if cached is not None:
            return cached
        with self._lock:
            out = to_geojson(self.engine.rawtile(tx, ty, tz), limit=self.limit)
        self.tile_cache.put(key, out)
        return out

    def page_bbox(self, minx: int, miny: int, maxx: int, maxy: int) -> str:
        key = (minx, miny, maxx, maxy)
        cached = self.bbox_cache.get(key)
        if cached is not None:
            return cached
        with self._lock:
            out = to_geojson(
                self.engine.scan_bbox(minx, miny, maxx, maxy), limit=self.limit
            )
        self.bbox_cache.put(key, out)
        return out

    def page_query(self, sql: str, bbox: tuple[int, int, int, int]) -> str:
        with self._lock:
            rows = self.engine.sql(sql, bbox).limit(self.limit).collect()
        return json.dumps(
            {"rows": [self._jsonable_row(r.asDict()) for r in rows], "n": len(rows)}
        )

    def _extract_df(self, minx: int, miny: int, maxx: int, maxy: int):
        regions = self.engine.spark.createDataFrame(
            [("req", "bbox", minx, miny, maxx, maxy, None, None)],
            "region_id string, kind string, minx long, miny long, "
            "maxx long, maxy long, lons array<long>, lats array<long>",
        )
        return self.engine.extract(regions)

    def page_extract(self, minx: int, miny: int, maxx: int, maxy: int) -> str:
        with self._lock:
            return to_geojson(
                self._extract_df(minx, miny, maxx, maxy), limit=self.limit
            )

    def extract_parquet(self, minx: int, miny: int, maxx: int, maxy: int) -> bytes:
        """Extract-as-artifact (the ``writefile.WritePbfIndexed`` analogue,
        ``osmquadtree-filter.go:217``): the trimmed, id-sorted regional
        extract as ONE parquet file — a re-ingestible table (``spark.read.
        parquet`` / ``TiledStore``), not a row rendering. Single-file because
        a download is one stream; the extract is already regional/pruned, so
        the coalesce(1) is a driver-edge collect-equivalent, not a bulk
        path."""
        import glob
        import shutil
        import tempfile

        with self._lock:
            df = self._extract_df(minx, miny, maxx, maxy)
            tmp = tempfile.mkdtemp(prefix="oqt_extract_")
            try:
                # extract() already global-sorts by (type,id); coalesce(1)
                # concatenates the range-sorted partitions in order
                df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/out")
                part = sorted(glob.glob(f"{tmp}/out/part-*.parquet"))[0]
                with open(part, "rb") as f:
                    return f.read()
            finally:
                shutil.rmtree(tmp, ignore_errors=True)

    @staticmethod
    def _jsonable_row(d: dict) -> dict:
        out = {}
        for k, v in d.items():
            try:
                json.dumps(v)
                out[k] = v
            except TypeError:
                out[k] = str(v)
        return out

    # ------------------------------------------------------------ handler
    def make_handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet test output
                pass

            def _send(self, body: str, ctype: str, code: int = 200) -> None:
                self._send_bytes(body.encode("utf-8"), ctype, code)

            def _send_bytes(
                self, data: bytes, ctype: str, code: int = 200,
                filename: str | None = None,
            ) -> None:
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                if filename:
                    self.send_header(
                        "Content-Disposition", f'attachment; filename="{filename}"'
                    )
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):  # noqa: N802 — stdlib API
                try:
                    url = urlparse(self.path)
                    q = {k: v[0] for k, v in parse_qs(url.query).items()}
                    parts = [p for p in url.path.split("/") if p]
                    if url.path == "/":
                        self._send(server.page_index(), "text/html")
                    elif url.path == "/status":
                        self._send(server.page_status(), "application/json")
                    elif parts and parts[0] == "tile" and len(parts) == 4:
                        tz, tx, ty = (int(p) for p in parts[1:])
                        self._send(server.page_tile(tz, tx, ty), "application/json")
                    elif url.path == "/bbox":
                        bb = tuple(int(q[k]) for k in ("minx", "miny", "maxx", "maxy"))
                        self._send(server.page_bbox(*bb), "application/json")
                    elif url.path == "/query":
                        bb = tuple(
                            int(v) for v in q.get("bbox", "").split(",")
                        )
                        if len(bb) != 4:
                            raise ValueError("bbox=minx,miny,maxx,maxy required")
                        self._send(server.page_query(q["sql"], bb), "application/json")
                    elif url.path == "/extract":
                        bb = tuple(int(q[k]) for k in ("minx", "miny", "maxx", "maxy"))
                        if q.get("format") == "parquet":
                            self._send_bytes(
                                server.extract_parquet(*bb),
                                "application/vnd.apache.parquet",
                                filename="extract.parquet",
                            )
                        else:
                            self._send(server.page_extract(*bb), "application/json")
                    else:
                        self._send(json.dumps({"error": "not found"}),
                                   "application/json", 404)
                except (KeyError, ValueError) as e:
                    self._send(json.dumps({"error": str(e)}), "application/json", 400)
                except Exception as e:  # noqa: BLE001 — surface, don't kill the server
                    self._send(json.dumps({"error": repr(e)}), "application/json", 500)

        return Handler


def serve(engine, host: str = "127.0.0.1", port: int = 0,
          limit: int = DEFAULT_LIMIT,
          allow_remote: bool = False) -> tuple[ThreadingHTTPServer, TileServer]:
    """Start the server on a background thread; returns (httpd, tile_server).
    ``port=0`` picks a free port (httpd.server_address[1]). Localhost-only by
    default — this sandbox has no egress and the reference server is a
    LAN-facing tool, not an internet service.

    Trust model: ``/query`` executes caller-supplied SQL against the Spark
    session (which can read arbitrary local paths), so every caller is
    trusted with the driver's filesystem view. Binding a non-loopback host
    therefore requires the explicit ``allow_remote=True`` opt-in; even then,
    expose it only to a trusted LAN (the reference server's deployment
    shape), never the internet."""
    if host not in ("127.0.0.1", "localhost", "::1") and not allow_remote:
        raise ValueError(
            "non-loopback bind requires allow_remote=True (/query executes "
            "arbitrary SQL with the driver's filesystem access)"
        )
    ts = TileServer(engine, limit=limit)
    httpd = ThreadingHTTPServer((host, port), ts.make_handler())
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd, ts

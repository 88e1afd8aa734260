"""REST facade over :class:`fastdb_spark.api.FastdbAPI` — the reference's
Flask URL surface (``src/webserver/server.py:298-311``, ``ltcvapp.py:
342-353``, ``spectrumapp.py:262-269``, ``dbapp.py:241-246``) on the
standard library's threading HTTP server, so the engine stays
framework-free.

Request convention mirrors the reference: POST (or GET) with an optional
JSON body of keyword arguments; path segments carry the processing
version / object id exactly as the Flask routes do.  Responses are JSON:
DataFrames as ``{"status": "ok", "rows": [...]}`` record lists, scalars
as ``{"status": "ok", "value": ...}``, errors as ``{"status": "error",
"error": "..."}`` with a 4xx/5xx code.

Driver-side by design: the HTTP layer is a thin dispatcher; every query
it serves is planned and executed by Spark exactly as through the Python
API (the reference's Flask workers are the same kind of frontend over
Postgres).
"""

from __future__ import annotations

import datetime as _dt
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

from pyspark.sql import DataFrame

from fastdb_spark.api import FastdbAPI

#: rows returned per DataFrame response unless the caller overrides —
#: an HTTP response is a driver materialization; unbounded collect of a
#: 100 TB result through a web worker is never right (the reference
#: routes big results through the async SQL queue instead).
DEFAULT_LIMIT = 10000


def _jsonable(v: Any):
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        import base64

        return base64.b64encode(bytes(v)).decode("ascii")
    if hasattr(v, "item"):  # numpy scalar
        return v.item()
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    return v


def _payload(result: Any, limit: int) -> dict:
    if isinstance(result, DataFrame):
        rows = [
            {k: _jsonable(v) for k, v in r.asDict(recursive=True).items()}
            for r in result.limit(limit).collect()
        ]
        return {"status": "ok", "rows": rows}
    if isinstance(result, dict):
        return {"status": "ok", **{k: _jsonable(v) for k, v in result.items()}}
    return {"status": "ok", "value": _jsonable(result)}


def _routes() -> list[tuple[str, Any]]:
    """(prefix, handler(api, parts, body)) dispatch table; ``parts`` are
    the path segments after the prefix."""

    def pv(parts, default="default"):
        return parts[0] if parts else default

    return [
        # server.py urls
        ("getprocvers", lambda a, p, b: a.processing_versions()),
        ("procver", lambda a, p, b: a.procver_info(p[0])),
        (
            "baseprocver",
            lambda a, p, b: a.base_procver_info(p[0], p[1] if len(p) > 1 else None),
        ),
        (
            "count",
            lambda a, p, b: a.count(p[0], pv(p[1:]), **b),
        ),
        (
            "getdiaobjectinfo",
            lambda a, p, b: a.get_object_infos(
                pv(p), objids=[p[1]] if len(p) > 1 else b.pop("objids", None), **b
            ),
        ),
        ("objectsearch", lambda a, p, b: a.object_search(pv(p), **b)),
        # ltcvapp.py urls
        ("getmanyltcvs", lambda a, p, b: a.get_many_ltcvs(pv(p), **b)),
        ("getltcv", lambda a, p, b: a.get_ltcv(p[0], p[1], **b)),
        ("getrandomltcv", lambda a, p, b: a.get_random_ltcv(pv(p), **b)),
        ("gethottransients", lambda a, p, b: a.get_hot_transients(pv(p), **b)),
        ("getbrokerinfo", lambda a, p, b: a.get_broker_info(pv(p), **b)),
        # spectrumapp.py urls
        ("askforspectrum", lambda a, p, b: a.ask_for_spectrum(**b)),
        ("spectrawanted", lambda a, p, b: a.spectra_wanted(**b)),
        ("planspectrum", lambda a, p, b: a.plan_spectrum(**b)),
        ("removespectrumplan", lambda a, p, b: a.remove_spectrum_plan(**b)),
        ("reportspectruminfo", lambda a, p, b: a.report_spectrum_info(**b)),
        ("getknownspectruminfo", lambda a, p, b: a.get_known_spectrum_info(**b)),
        # dbapp.py urls
        ("runsqlquery", lambda a, p, b: a.run_sql(b["query"], b.get("subdict"))),
        (
            "submitsqlquery",
            lambda a, p, b: a.submit_sql_query(
                b.get("userid", ""), b["queries"], b.get("format", "csv")
            ),
        ),
        ("checksqlquery", lambda a, p, b: a.check_sql_query(p[0])),
        ("getsqlqueryresults", lambda a, p, b: a.get_sql_query_results(p[0])),
    ]


class FastdbHTTPServer:
    """Threaded HTTP frontend over one FastdbAPI instance."""

    def __init__(self, api: FastdbAPI, host: str = "127.0.0.1", port: int = 0):
        routes = _routes()

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet test output
                pass

            def _respond(self):
                try:
                    length = int(self.headers.get("Content-Length") or 0)
                    body = (
                        json.loads(self.rfile.read(length) or b"{}")
                        if length
                        else {}
                    )
                    if not isinstance(body, dict):
                        raise ValueError("body must be a JSON object")
                    limit = int(body.pop("limit", DEFAULT_LIMIT))
                    parts = [p for p in self.path.split("?")[0].split("/") if p]
                    if not parts:
                        out, code = {"status": "ok", "value": "fastdb-spark"}, 200
                    else:
                        for prefix, fn in routes:
                            if parts[0] == prefix:
                                out = _payload(fn(api, parts[1:], body), limit)
                                code = 200
                                break
                        else:
                            out, code = {
                                "status": "error",
                                "error": f"unknown endpoint {parts[0]!r}",
                            }, 404
                except (KeyError, ValueError, TypeError, IndexError) as e:
                    out, code = {"status": "error", "error": str(e)}, 400
                except Exception as e:  # noqa: BLE001 — error surface is JSON
                    out, code = {"status": "error", "error": str(e)}, 500
                raw = json.dumps(out).encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(raw)))
                self.end_headers()
                self.wfile.write(raw)

            do_GET = _respond
            do_POST = _respond

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def start(self) -> "FastdbHTTPServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=10)


def serve(api: FastdbAPI, host: str = "0.0.0.0", port: int = 8080) -> None:
    """Blocking entry point (the reference's gunicorn-worker analog)."""
    FastdbHTTPServer(api, host, port)._httpd.serve_forever()

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

Auth mirrors the reference's rkauth gate in shape, not mechanism
(``db/2025-02-18_001_init.sql:14-32`` authuser table + session auth on
every endpoint, ``src/webserver/baseview.py:72-96`` check_auth): pass
``tokens={"<token>": "<username>"}`` and every request must carry
``Authorization: Bearer <token>`` or get a 401.  The authenticated
username also scopes the async SQL queue exactly as the reference scopes
it by ``flask.session['useruuid']`` (``src/webserver/dbapp.py:143-149``):
submissions are recorded under the caller, and another user polling or
fetching that query id gets a 403.  ``tokens=None`` (default) disables
the gate — the single-user engine-demo mode.
"""

from __future__ import annotations

import datetime as _dt
import hmac
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

from pyspark.sql import DataFrame

from fastdb_spark.api import FastdbAPI


class AuthError(Exception):
    """Request not authenticated (no/unknown bearer token) -> 401."""

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


def _own_query(api: FastdbAPI, queryid: str, user: str | None) -> None:
    """Reference-style per-user queue isolation: with auth on, a query id
    may only be polled/fetched by the user who submitted it."""
    if user is None:
        return
    row = api.queue.status(queryid) if api.queue is not None else None
    if row is not None and row["userid"] != user:
        raise PermissionError(f"query {queryid} belongs to another user")


def _routes() -> list[tuple[str, Any]]:
    """(prefix, handler(api, parts, body, user)) dispatch table; ``parts``
    are the path segments after the prefix, ``user`` the authenticated
    username (None with auth disabled)."""

    def pv(parts, default="default"):
        return parts[0] if parts else default

    def submit(a, p, b, u):
        # with auth on the caller cannot submit as someone else
        userid = u if u is not None else b.get("userid", "")
        return a.submit_sql_query(userid, b["queries"], b.get("format", "csv"))

    def check(a, p, b, u):
        _own_query(a, p[0], u)
        return a.check_sql_query(p[0])

    def results(a, p, b, u):
        _own_query(a, p[0], u)
        return a.get_sql_query_results(p[0])

    return [
        # server.py urls
        ("getprocvers", lambda a, p, b, u: a.processing_versions()),
        ("procver", lambda a, p, b, u: a.procver_info(p[0])),
        (
            "baseprocver",
            lambda a, p, b, u: a.base_procver_info(p[0], p[1] if len(p) > 1 else None),
        ),
        (
            "count",
            lambda a, p, b, u: a.count(p[0], pv(p[1:]), **b),
        ),
        (
            "getdiaobjectinfo",
            lambda a, p, b, u: a.get_object_infos(
                pv(p), objids=[p[1]] if len(p) > 1 else b.pop("objids", None), **b
            ),
        ),
        ("objectsearch", lambda a, p, b, u: a.object_search(pv(p), **b)),
        # ltcvapp.py urls
        ("getmanyltcvs", lambda a, p, b, u: a.get_many_ltcvs(pv(p), **b)),
        ("getltcv", lambda a, p, b, u: a.get_ltcv(p[0], p[1], **b)),
        ("getrandomltcv", lambda a, p, b, u: a.get_random_ltcv(pv(p), **b)),
        ("gethottransients", lambda a, p, b, u: a.get_hot_transients(pv(p), **b)),
        ("getbrokerinfo", lambda a, p, b, u: a.get_broker_info(pv(p), **b)),
        # spectrumapp.py urls
        ("askforspectrum", lambda a, p, b, u: a.ask_for_spectrum(**b)),
        ("spectrawanted", lambda a, p, b, u: a.spectra_wanted(**b)),
        ("planspectrum", lambda a, p, b, u: a.plan_spectrum(**b)),
        ("removespectrumplan", lambda a, p, b, u: a.remove_spectrum_plan(**b)),
        ("reportspectruminfo", lambda a, p, b, u: a.report_spectrum_info(**b)),
        ("getknownspectruminfo", lambda a, p, b, u: a.get_known_spectrum_info(**b)),
        # dbapp.py urls
        ("runsqlquery", lambda a, p, b, u: a.run_sql(b["query"], b.get("subdict"))),
        ("submitsqlquery", submit),
        ("checksqlquery", check),
        ("getsqlqueryresults", results),
    ]


class FastdbHTTPServer:
    """Threaded HTTP frontend over one FastdbAPI instance.

    ``tokens`` maps bearer token -> username; when given, every endpoint
    requires ``Authorization: Bearer <token>`` (401 otherwise) and the
    async SQL queue is scoped per authenticated user (403 on another
    user's query id)."""

    def __init__(
        self,
        api: FastdbAPI,
        host: str = "127.0.0.1",
        port: int = 0,
        tokens: dict[str, str] | None = None,
    ):
        routes = _routes()

        def authenticate(header: str | None) -> str | None:
            if tokens is None:
                return None
            if not header or not header.startswith("Bearer "):
                raise AuthError("not authenticated: missing bearer token")
            supplied = header[len("Bearer "):].strip()
            for tok, username in tokens.items():
                # constant-time compare — no token-prefix timing oracle
                if hmac.compare_digest(tok, supplied):
                    return username
            raise AuthError("not authenticated: unknown token")

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet test output
                pass

            def _respond(self):
                try:
                    user = authenticate(self.headers.get("Authorization"))
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
                                out = _payload(
                                    fn(api, parts[1:], body, user), limit
                                )
                                code = 200
                                break
                        else:
                            out, code = {
                                "status": "error",
                                "error": f"unknown endpoint {parts[0]!r}",
                            }, 404
                except AuthError as e:
                    out, code = {"status": "error", "error": str(e)}, 401
                except PermissionError as e:
                    out, code = {"status": "error", "error": str(e)}, 403
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


def serve(
    api: FastdbAPI,
    host: str = "0.0.0.0",
    port: int = 8080,
    tokens: dict[str, str] | None = None,
) -> None:
    """Blocking entry point (the reference's gunicorn-worker analog)."""
    FastdbHTTPServer(api, host, port, tokens=tokens)._httpd.serve_forever()

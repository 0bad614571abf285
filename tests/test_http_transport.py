"""Integration tests: the requests-backed HttpTransport against a real
local HTTP server (stdlib http.server in a thread — no fixtures mocked at
the requests layer, actual sockets), wired through the same rest.*
pagination operators the hermetic tests drive with fixture transports.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

pytest.importorskip("requests")

from bi_gcp_stitch_repl_spark.sources import rest
from bi_gcp_stitch_repl_spark.sources.http_transport import (
    BearerTokenAuth,
    HttpTransport,
    OAuthPasswordGrant,
)

TOKENS = ["tok-1", "tok-2"]  # first grant, then the post-expiry refresh
ITEMS = [{"id": i, "amount": i * 10} for i in range(1, 8)]


class _ApiHandler(BaseHTTPRequestHandler):
    """Tiny billwerk/lexoffice-shaped API: password-grant token endpoint,
    bearer-protected offset/limit collection, a flaky 429 endpoint, and a
    token that expires after N calls (to exercise the 401 refresh path)."""

    server_version = "FixtureAPI/1.0"

    def _send(self, code: int, body: dict | list) -> None:
        payload = json.dumps(body).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def do_POST(self):  # noqa: N802 - http.server API
        if urlparse(self.path).path == "/oauth/token":
            length = int(self.headers.get("Content-Length", 0))
            form = parse_qs(self.rfile.read(length).decode())
            state = self.server.state
            if (
                form.get("grant_type") == ["password"]
                and form.get("username") == ["u"]
                and form.get("password") == ["p"]
                and self.headers.get("Authorization", "").startswith("Basic ")
            ):
                state["grants"] += 1
                self._send(200, {"access_token": TOKENS[min(state["grants"] - 1, 1)]})
            else:
                self._send(400, {"error": "invalid_grant"})
            return
        if urlparse(self.path).path == "/accept":
            # reverse-ETL acknowledge endpoint: 204, no body
            self.send_response(204)
            self.end_headers()
            return
        self._send(404, {"error": "not found"})

    def do_GET(self):  # noqa: N802 - http.server API
        url = urlparse(self.path)
        qs = {k: v[0] for k, v in parse_qs(url.query).items()}
        state = self.server.state
        auth = self.headers.get("Authorization", "")
        if url.path == "/items":
            state["calls"] += 1
            valid = {f"Bearer {TOKENS[min(state['grants'] - 1, 1)]}"} if state["grants"] else set()
            if state["expire_after"] and state["calls"] > state["expire_after"]:
                # token rotated server-side: old bearer now rejected
                valid = {f"Bearer {TOKENS[1]}"}
            if auth not in valid and auth != "Bearer static-token":
                self._send(401, {"error": "unauthorized"})
                return
            offset, limit = int(qs.get("offset", 0)), int(qs.get("limit", 3))
            self._send(200, {"items": ITEMS[offset : offset + limit]})
            return
        if url.path.startswith("/v4/spreadsheets/"):
            # Sheets API v4 values.get: /v4/spreadsheets/<id>/values/<range>
            if auth != "Bearer static-token":
                self._send(401, {"error": "unauthorized"})
                return
            self._send(
                200,
                {
                    "range": url.path.rsplit("/", 1)[-1],
                    "majorDimension": qs.get("majorDimension", "ROWS"),
                    "values": [
                        ["org", "tier", ""],
                        ["acme", "gold", ""],
                        ["beta", "", ""],
                    ],
                },
            )
            return
        if url.path == "/flaky":
            state["calls"] += 1
            if state["calls"] < 3:
                self._send(429, {"error": "rate limited"})
            else:
                self._send(200, {"ok": True, "after": state["calls"]})
            return
        self._send(404, {"error": "not found"})

    def log_message(self, *args):  # silence per-request stderr noise
        pass


@pytest.fixture
def api_server():
    server = ThreadingHTTPServer(("127.0.0.1", 0), _ApiHandler)
    server.state = {"grants": 0, "calls": 0, "expire_after": 0}
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        yield server, f"http://127.0.0.1:{server.server_address[1]}"
    finally:
        server.shutdown()
        thread.join(timeout=5)


def test_bearer_transport_paginates_real_http(api_server):
    """S1 offset/limit pagination through real sockets with bearer auth."""
    _, base = api_server
    transport = HttpTransport(auth=BearerTokenAuth("static-token"))
    pages = list(
        rest.paginate_offset(transport, f"{base}/items", limit=3, items_key="items")
    )
    assert [len(p) for p in pages] == [3, 3, 1]
    assert [r["id"] for p in pages for r in p] == list(range(1, 8))


def test_oauth_password_grant_fetches_token_lazily(api_server):
    server, base = api_server
    auth = OAuthPasswordGrant(
        token_url=f"{base}/oauth/token",
        username="u",
        password="p",
        client_id="cid",
        client_secret="sec",
    )
    transport = HttpTransport(auth=auth)
    assert server.state["grants"] == 0  # nothing fetched until first use
    rows = transport(f"{base}/items", {"offset": 0, "limit": 5})["items"]
    assert len(rows) == 5
    assert server.state["grants"] == 1
    transport(f"{base}/items", {"offset": 5, "limit": 5})
    assert server.state["grants"] == 1  # token cached across calls


def test_oauth_refreshes_on_401(api_server):
    server, base = api_server
    server.state["expire_after"] = 1  # server rotates the token after 1 call
    auth = OAuthPasswordGrant(
        token_url=f"{base}/oauth/token",
        username="u",
        password="p",
        client_id="cid",
        client_secret="sec",
    )
    transport = HttpTransport(auth=auth)
    transport(f"{base}/items", {"offset": 0, "limit": 2})
    out = transport(f"{base}/items", {"offset": 2, "limit": 2})  # 401 -> refresh
    assert [r["id"] for r in out["items"]] == [3, 4]
    assert server.state["grants"] == 2


def test_429_maps_to_retryable_and_policy_recovers(api_server):
    _, base = api_server
    transport = HttpTransport(auth=BearerTokenAuth("static-token"))
    naps: list[float] = []
    policy = rest.RetryPolicy(total=4, backoff_factor=0.01, sleep=naps.append)
    out = policy.call(lambda: transport(f"{base}/flaky"))
    assert out["ok"] is True
    assert len(naps) == 2  # two 429s, two backoffs, then success


def test_transport_survives_pickle_roundtrip(api_server):
    """fanout_fetch pickles the transport into mapInPandas workers; the
    session and token must rebuild per process."""
    import pickle

    server, base = api_server
    auth = OAuthPasswordGrant(
        token_url=f"{base}/oauth/token",
        username="u",
        password="p",
        client_id="cid",
        client_secret="sec",
    )
    transport = HttpTransport(auth=auth)
    transport(f"{base}/items", {"offset": 0, "limit": 1})
    clone = pickle.loads(pickle.dumps(transport))
    rows = clone(f"{base}/items", {"offset": 1, "limit": 2})["items"]
    assert [r["id"] for r in rows] == [2, 3]


def test_sheets_source_via_rest_api(api_server, spark):
    """S10 production path: Sheets API v4 values.get through HttpTransport,
    header promotion + empty-column drop via sheet_to_dataframe."""
    _, base = api_server
    from bi_gcp_stitch_repl_spark.sources.sheets import sheet_source

    transport = HttpTransport(auth=BearerTokenAuth("static-token"))
    df = sheet_source(
        spark,
        transport,
        "sheet-1",
        "Orgs!A1:C3",
        api_base=f"{base}/v4/spreadsheets",
    )
    assert df.columns == ["org", "tier"]  # empty-header column dropped
    rows = {r["org"]: r["tier"] for r in df.collect()}
    assert rows == {"acme": "gold", "beta": ""}


def test_example_factory_builds_from_env(monkeypatch):
    """The config-file factory (examples/billwerk_job.json) must construct
    a picklable OAuth transport from environment credentials."""
    import pickle

    from bi_gcp_stitch_repl_spark.sources.http_transport import (
        OAuthPasswordGrant,
        example_billwerk_transport,
    )

    for k, v in {
        "BILLWERK_TOKEN_URL": "https://example.invalid/oauth/token",
        "BILLWERK_USERNAME": "u",
        "BILLWERK_PASSWORD": "p",
        "BILLWERK_CLIENT_ID": "cid",
        "BILLWERK_CLIENT_SECRET": "cs",
    }.items():
        monkeypatch.setenv(k, v)
    t = example_billwerk_transport()
    assert isinstance(t.auth, OAuthPasswordGrant)
    clone = pickle.loads(pickle.dumps(t))  # ships into fan-out workers
    assert clone.auth.token_url == "https://example.invalid/oauth/token"
    assert clone.auth._token is None  # workers fetch their own token


def test_post_204_no_content_returns_none(api_server):
    """Review r05: a body-less 2xx acknowledgement (204 — common from
    reverse-ETL accept endpoints) must return None, not crash in .json()
    — a retried 'failure' would double-deliver the batch."""
    from bi_gcp_stitch_repl_spark.sources.http_transport import HttpTransport

    _, base = api_server
    t = HttpTransport()
    assert t.post(f"{base}/accept", {"rows": [1, 2]}) is None

"""HTTP client tests: the extractor suite driven end-to-end through
HttpFirebase against a local HTTP stub (SURVEY.md §5.3) that serves a
FakeFirebase tree over the real Firebase REST wire format.

The stub is the missing half of the reference parity story: it speaks
exactly what https://<project>.firebaseio.com speaks — `.json` paths,
JSON-encoded orderBy/startAt values, `{"error": "Payload is too large"}`
bodies on oversized pages (src/BackupProcessor.php:173), `auth=` token
enforcement (src/cli-commands/AbstractCommand.php:95-114) — so every
request HttpFirebase emits is validated against the protocol, not
against a Python double's kwargs.
"""

from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from firebase_realtime_database_backup_spark.sources.firebase import (
    FakeFirebase,
    FirebaseExtractor,
    FirebaseTransportError,
    PayloadTooLarge,
)
from firebase_realtime_database_backup_spark.sources.http_client import (
    HttpFirebase,
)

TREE = {
    "users": {f"u{i:03d}": {"name": f"user {i}", "score": i} for i in range(40)},
    "config": {"mode": "prod", "flags": {"a": True, "b": False}},
    "version": 7,
}


class _StubHandler(BaseHTTPRequestHandler):
    """Translate Firebase REST requests back onto a FakeFirebase."""

    fake: FakeFirebase
    required_token: str | None = None
    seen_queries: list[dict]
    fail_next: list[int]  # HTTP codes to emit before serving normally

    def _reply(self, code: int, payload) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _parse(self):
        parsed = urllib.parse.urlparse(self.path)
        if not parsed.path.endswith(".json"):
            self._reply(404, {"error": "not a .json path"})
            return None, None
        path = urllib.parse.unquote(parsed.path[: -len(".json")]) or "/"
        q = {k: v[-1] for k, v in urllib.parse.parse_qs(parsed.query).items()}
        type(self).seen_queries.append({"path": path, **q})
        if self.required_token is not None and q.get("auth") != self.required_token:
            self._reply(401, {"error": "Permission denied"})
            return None, None
        return path, q

    def do_GET(self) -> None:  # noqa: N802 (http.server API)
        if type(self).fail_next:
            self._reply(type(self).fail_next.pop(0), {"error": "injected"})
            return
        path, q = self._parse()
        if path is None:
            return
        kwargs = {}
        if q.get("shallow") == "true":
            kwargs["shallow"] = True
        if "orderBy" in q:
            assert q["orderBy"] == '"$key"', q["orderBy"]  # JSON-quoted
            kwargs["order_by_key"] = True
        if "limitToFirst" in q:
            kwargs["limit_to_first"] = int(q["limitToFirst"])
        if "startAt" in q:
            # must be a JSON-encoded string, as the reference sends it
            kwargs["start_at"] = json.loads(q["startAt"])
        try:
            self._reply(200, self.fake.get(path, **kwargs))
        except PayloadTooLarge:
            # reference-style: 200 with an error body (BackupProcessor.php:173)
            self._reply(200, {"error": "Payload is too large"})

    def do_PATCH(self) -> None:  # noqa: N802
        path, _ = self._parse()
        if path is None:
            return
        n = int(self.headers["Content-Length"])
        data = json.loads(self.rfile.read(n))
        try:
            self.fake.update(path, data)
        except FirebaseTransportError as exc:
            self._reply(500, {"error": str(exc)})
            return
        self._reply(200, data)

    def log_message(self, *args) -> None:  # keep pytest output clean
        pass


@pytest.fixture
def stub_server():
    """Factory: start a stub over a FakeFirebase, yield (client, fake, handler)."""
    servers = []

    def start(fake: FakeFirebase, token: str | None = None,
              client_token: str | None = "s3cret"):
        handler = type(
            "Handler",
            (_StubHandler,),
            {"fake": fake, "required_token": token,
             "seen_queries": [], "fail_next": []},
        )
        srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        servers.append(srv)
        client = HttpFirebase(
            f"http://127.0.0.1:{srv.server_address[1]}", auth_token=client_token
        )
        return client, handler

    yield start
    for srv in servers:
        srv.shutdown()
        srv.server_close()


def test_http_roundtrip_matches_direct_extraction(stub_server):
    """The full AIMD extractor over HTTP yields exactly the rows the
    same extractor yields against the in-process double."""
    client, handler = stub_server(FakeFirebase(TREE))
    via_http = sorted(FirebaseExtractor(client, max_ipp=16).iter_rows())
    direct = sorted(FirebaseExtractor(FakeFirebase(TREE), max_ipp=16).iter_rows())
    assert via_http == direct
    # page-grained rows: 3 root children, each value_json a full subtree
    assert [r[1] for r in via_http] == ["config", "users", "version"]
    # protocol shape: paginated scans carried JSON-quoted orderBy
    assert any(q.get("orderBy") == '"$key"' for q in handler.seen_queries)


def test_http_payload_too_large_drives_aimd(stub_server):
    """A byte-budgeted server pushes 'Payload is too large' bodies; the
    extractor halves page size over HTTP exactly as it does in-process."""
    fake = FakeFirebase(TREE, max_payload_bytes=400)
    client, _ = stub_server(fake)
    ex = FirebaseExtractor(client, max_ipp=64)
    rows = sorted(ex.iter_rows())
    direct_ex = FirebaseExtractor(
        FakeFirebase(TREE, max_payload_bytes=400), max_ipp=64
    )
    assert rows == sorted(direct_ex.iter_rows())
    assert ex.stats.halvings > 0


def test_http_413_maps_to_payload_too_large(stub_server):
    client, handler = stub_server(FakeFirebase(TREE))
    handler.fail_next.append(413)
    with pytest.raises(PayloadTooLarge):
        client.get("/users", order_by_key=True, limit_to_first=1000)


def test_http_transport_error_and_shallow_retry(stub_server):
    """5xx responses surface as FirebaseTransportError, which the
    extractor's bounded shallow-retry loop (S2) absorbs."""
    client, handler = stub_server(FakeFirebase(TREE))
    handler.fail_next.append(500)
    with pytest.raises(FirebaseTransportError):
        client.get("/users", shallow=True)
    handler.fail_next.extend([500, 500])
    ex = FirebaseExtractor(client)
    assert ex._children("/users") == sorted(TREE["users"])  # retried through
    assert ex.stats.shallow_retries == 2


def test_http_auth_token_required(stub_server):
    """The stub enforces auth=<token> on every request, mirroring the
    -k/--project_key database secret."""
    good, handler = stub_server(FakeFirebase(TREE), token="s3cret")
    assert good.get("/version") == 7
    assert all(q.get("auth") == "s3cret" for q in handler.seen_queries)
    bad, _ = stub_server(FakeFirebase(TREE), token="s3cret", client_token=None)
    with pytest.raises(FirebaseTransportError):
        bad.get("/version")


def test_http_update_merge_patch(stub_server):
    """PATCH bodies land as Firebase update() merge semantics."""
    fake = FakeFirebase(TREE)
    client, _ = stub_server(fake)
    client.update("/config", {"mode": "staging", "new_key": 1})
    assert fake.tree["config"]["mode"] == "staging"
    assert fake.tree["config"]["new_key"] == 1
    assert fake.tree["config"]["flags"] == {"a": True, "b": False}  # merged


def test_http_scalar_and_missing_paths(stub_server):
    client, _ = stub_server(FakeFirebase(TREE))
    assert client.get("/version") == 7
    assert client.get("/nope/nothing") is None
    shallow = client.get("/users", shallow=True)
    assert set(shallow) == set(TREE["users"]) and all(shallow.values())


def test_http_extract_distributed(spark, stub_server):
    """Cluster-scale export through HTTP: extract_distributed ships
    subtree roots to executors, each task builds its own HttpFirebase
    from the picklable factory and pages its subtree over REST."""
    from firebase_realtime_database_backup_spark.sources.firebase import (
        extract_distributed,
    )

    client, _ = stub_server(FakeFirebase(TREE))
    base_url, token = client.base_url, client.auth_token
    from firebase_realtime_database_backup_spark.sources.http_client import (
        HttpFirebase,
    )

    df = extract_distributed(
        spark,
        lambda: HttpFirebase(base_url, auth_token=token),
        ["/users", "/config"],
        max_ipp=8,
    )
    rows = sorted(tuple(r) for r in df.collect())
    direct = sorted(
        list(FirebaseExtractor(FakeFirebase(TREE), max_ipp=8).iter_rows("/users"))
        + list(FirebaseExtractor(FakeFirebase(TREE), max_ipp=8).iter_rows("/config"))
    )
    assert rows == direct
    assert len(rows) >= 40  # users paged at ipp=8 into leaf-grained rows


def test_http_awkward_keys_roundtrip(stub_server):
    """RTDB keys may contain spaces, '?', '&', '%', '+' (only . $ # [ ]
    / are forbidden): path segments must be percent-encoded or a key
    like 'a?b' would truncate into the query string and fetch the WRONG
    node silently."""
    tree = {"a?b": {"x": 1}, "with space": 2, "pct%25": 3, "plus+c": 4}
    client, _ = stub_server(FakeFirebase(tree))
    assert client.get("/a?b") == {"x": 1}
    assert client.get("/with space") == 2
    assert client.get("/pct%25") == 3
    assert client.get("/plus+c") == 4
    rows = sorted(FirebaseExtractor(client, max_ipp=16).iter_rows())
    direct = sorted(FirebaseExtractor(FakeFirebase(tree), max_ipp=16).iter_rows())
    assert rows == direct


def test_http_error_messages_redact_auth_secret(stub_server):
    """Transport errors must never quote the auth secret — the -k
    database key grants full read-write access and error text lands in
    logs and tracebacks."""
    client, handler = stub_server(FakeFirebase(TREE))
    handler.fail_next.append(500)
    with pytest.raises(FirebaseTransportError) as ei:
        client.get("/users", shallow=True)
    assert "s3cret" not in str(ei.value)
    assert "auth=REDACTED" in str(ei.value)


def test_http_end_to_end_backup_restore_roundtrip(spark, stub_server, tmp_path):
    """Full-system parity over the wire: export a tree through the HTTP
    client into a parquet snapshot, then restore the snapshot into an
    EMPTY database through the same client (executor-side PATCH
    batches) — the restored tree must equal the source tree.  This is
    the reference's export→import contract driven end-to-end over REST
    instead of in-process doubles."""
    from firebase_realtime_database_backup_spark.api import do_backup, do_restore
    from firebase_realtime_database_backup_spark.sources.http_client import (
        HttpFirebase,
    )

    src_client, _ = stub_server(FakeFirebase(TREE))
    snap = str(tmp_path / "http_snapshot")
    do_backup(spark, src_client, snap, max_ipp=8, parallelism=2)

    dest_fake = FakeFirebase({})
    dest_client, _ = stub_server(dest_fake)
    base_url, token = dest_client.base_url, dest_client.auth_token
    do_restore(
        spark,
        snap,
        lambda: HttpFirebase(base_url, auth_token=token),
        max_batch=8,
    )
    assert dest_fake.tree == TREE

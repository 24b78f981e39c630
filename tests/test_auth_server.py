"""V3 auth flow over HTTP (reference server_test.clj SCRAM-ish login):
challenge -> login -> authorized query; 401 without a token."""

import json
import http.client

import pytest

from unifydb_spark import Engine, FactStore
from unifydb_spark.auth import client_hash
from unifydb_spark.cache import TTLCache
from unifydb_spark.server import serve_background

SECRET = b"test-secret"


@pytest.fixture(scope="module")
def srv(spark):
    eng = Engine(spark, FactStore(spark))
    eng.transact([
        [":unifydb/add", "u", ":unifydb/username", "user"],
        [":unifydb/add", "u", ":unifydb/password", "pencil"],
        ["add", "d", ":answer", 42],
    ])
    server, port = serve_background(eng, secret=SECRET, require_auth=True)
    yield port
    server.shutdown()


def _req(port, method, path, payload=None, token=None):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    headers = {"Content-Type": "application/json"}
    if token:
        headers["Authorization"] = f"Bearer {token}"
    conn.request(method, path, json.dumps(payload) if payload else None, headers)
    resp = conn.getresponse()
    body = json.loads(resp.read())
    conn.close()
    return resp.status, body


def test_full_login_flow(srv):
    # unauthenticated query -> 401 (reference wrap-jwt-auth)
    status, _ = _req(srv, "POST", "/query",
                     {"query": {"find": ["?v"], "where": [["?e", ":answer", "?v"]]}})
    assert status == 401

    # step 1: challenge
    status, ch = _req(srv, "GET", "/authenticate?username=user")
    assert status == 200 and ch["username"] == "user"

    # step 2: login with salted hash + nonce
    status, res = _req(srv, "POST", "/authenticate", {
        "username": "user",
        "password": client_hash("pencil", ch["salt"]),
        "nonce-key": ch["nonce-key"],
        "nonce": ch["nonce"],
    })
    assert status == 200
    token = res["token"]

    # authorized query succeeds
    status, out = _req(srv, "POST", "/query",
                       {"query": {"find": ["?v"], "where": [["?e", ":answer", "?v"]]}},
                       token=token)
    assert status == 200 and out["results"] == [[42]]


def test_bad_password_rejected(srv):
    status, ch = _req(srv, "GET", "/authenticate?username=user")
    status, res = _req(srv, "POST", "/authenticate", {
        "username": "user",
        "password": client_hash("wrong", ch["salt"]),
        "nonce-key": ch["nonce-key"],
        "nonce": ch["nonce"],
    })
    assert status == 400


def test_unknown_user_rejected(srv):
    status, _ = _req(srv, "GET", "/authenticate?username=nobody")
    assert status == 400


def test_tampered_token_rejected(srv):
    status, _ = _req(srv, "POST", "/query",
                     {"query": {"find": ["?v"], "where": [["?e", ":answer", "?v"]]}},
                     token="AAAA.deadbeef")
    assert status == 401


def test_ttl_cache():
    t = [0.0]
    c = TTLCache(clock=lambda: t[0])
    c.set("k", "v", 60)
    assert c.get("k") == "v"
    t[0] = 61
    assert c.get("k") is None

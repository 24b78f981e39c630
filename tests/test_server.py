"""HTTP surface tests (reference test/unifydb/server_test.clj shapes):
/transact then /query round-trip, structured errors, 404."""

import json
import http.client

import pytest

from unifydb_spark import Engine, FactStore
from unifydb_spark.server import serve_background


@pytest.fixture(scope="module")
def srv(spark):
    eng = Engine(spark, FactStore(spark))
    server, port = serve_background(eng)
    yield port
    server.shutdown()


def _post(port, path, payload):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("POST", path, json.dumps(payload),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    body = json.loads(resp.read())
    conn.close()
    return resp.status, body


def test_transact_then_query(srv):
    status, rep = _post(srv, "/transact", {
        "tx-data": [["add", "ben", ":name", "Ben"],
                    ["add", "ben", ":salary", 60000]],
    })
    assert status == 200
    assert "ben" in rep["tempids"]
    assert rep["tx-id"] == rep["tempids"]["unifydb.tx"]

    status, res = _post(srv, "/query", {
        "query": {"find": ["?e", "?s"],
                  "where": [["?e", ":name", "Ben"], ["?e", ":salary", "?s"]]},
    })
    assert status == 200
    assert res["columns"] == ["e", "s"]
    assert res["results"] == [[{"$ref": rep["tempids"]["ben"]}, 60000]]


def test_query_with_call_encoding(srv):
    # predicates/tuples travel as {"$call": [...]} in JSON
    status, res = _post(srv, "/query", {
        "query": {"find": ["?s"],
                  "where": [["?e", ":salary", "?s"],
                            [{"$call": [">", "?s", 1000]}]]},
    })
    assert status == 200
    assert res["results"] == [[60000]]


def test_structured_error(srv):
    status, res = _post(srv, "/query", {
        "query": {"find": ["?x"], "where": [[("nope", "?x")]]},
    })
    assert status == 400
    assert "error" in res and res["error"]["code"]


def test_unknown_fn_error(srv):
    status, res = _post(srv, "/query", {
        "query": {"find": ["?s"],
                  "where": [["?e", ":salary", "?s"],
                            [{"$call": ["*foo", "?s", 2]}, "?t"]]},
    })
    assert status == 400
    assert res["error"]["code"] == "unknown-function"


def test_404(srv):
    status, res = _post(srv, "/nope", {})
    assert status == 404


def _post_raw(port, path, body, headers):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("POST", path, body, headers)
    resp = conn.getresponse()
    raw = resp.read().decode("utf-8")
    ctype = resp.getheader("Content-Type")
    conn.close()
    return resp.status, ctype, raw


def test_edn_round_trip(srv):
    """V4 content negotiation (reference server.clj:54-81): EDN in, EDN
    out — predicates are naturally EDN lists (no $call wrapper), refs are
    tagged literals."""
    from unifydb_spark import edn
    from unifydb_spark.values import Ref

    q = '{:query {:find [?e ?s] :where [[?e :name "Ben"] [?e :salary ?s] [(> ?s 1000)]]}}'
    status, ctype, raw = _post_raw(
        srv, "/query", q,
        {"Content-Type": "application/edn", "Accept": "application/edn"},
    )
    assert status == 200 and ctype == "application/edn"
    out = edn.loads(raw)
    assert out["columns"] == ["e", "s"]
    [[ref, sal]] = out["results"]
    assert isinstance(ref, Ref) and sal == 60000


def test_edn_in_json_out(srv):
    q = '{:query {:find [?s] :where [[_ :salary ?s]]}}'
    status, ctype, raw = _post_raw(
        srv, "/query", q,
        {"Content-Type": "application/edn", "Accept": "application/json"},
    )
    assert status == 200 and ctype == "application/json"
    assert json.loads(raw)["results"] == [[60000]]


def test_unsupported_content_type_400(srv):
    status, _, raw = _post_raw(
        srv, "/query", "<query/>", {"Content-Type": "text/xml"},
    )
    assert status == 400
    assert "Unsupported content type" in raw


def test_unsupported_accept_400(srv):
    status, _, raw = _post_raw(
        srv, "/query", "{}",
        {"Content-Type": "application/json", "Accept": "text/csv"},
    )
    assert status == 400
    assert "Unsupported accept type" in raw

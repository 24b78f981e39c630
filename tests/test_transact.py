"""Transactor tests (reference test/unifydb/transact_test.clj): tempid
resolution, tx metadata, map-form expansion, end-to-end write->query."""

import pytest

from unifydb_spark import Engine, FactStore, Ref


@pytest.fixture()
def eng(spark):
    return Engine(spark, FactStore(spark))


def test_transact_and_query(eng):
    report = eng.transact(
        [
            ["add", "ben", ":name", "Ben Bitdiddle"],
            ["add", "ben", ":salary", 60000],
            ["add", "alyssa", ":name", "Alyssa P. Hacker"],
            ["add", "alyssa", ":supervisor", "ben"],
        ]
    )
    tempids = report["tempids"]
    assert set(tempids) == {"ben", "alyssa", "unifydb.tx"}
    ben, alyssa = tempids["ben"], tempids["alyssa"]
    assert ben != alyssa
    # tempid in value position resolved to a ref (transact.clj:70-96)
    got = eng.query_rows(
        {"find": ["?sup"], "where": [["?e", ":name", "Alyssa P. Hacker"], ["?e", ":supervisor", "?sup"]]}
    )
    assert got == [(Ref(ben),)]
    # every tx auto-adds a txInstant fact (transact.clj:17-21)
    tx = tempids["unifydb.tx"]
    inst = eng.query_rows(
        {"find": ["?t"], "where": [[tx, ":unifydb/txInstant", "?t"]]}
    )
    assert len(inst) == 1 and isinstance(inst[0][0], int)


def test_retract(eng):
    r1 = eng.transact([["add", "e", ":color", "red"]])
    eid = r1["tempids"]["e"]
    eng.transact([[":unifydb/retract", eid, ":color", "red"]])
    q = {"find": ["?c"], "where": [[eid, ":color", "?c"]]}
    assert eng.query_rows(q) == []
    # still visible as-of the first tx (time travel)
    assert eng.query_rows(q, eng.db(r1["tempids"]["unifydb.tx"])) == [("red",)]


def test_map_form(eng):
    report = eng.transact(
        [
            {
                ":name": "Corp",
                ":employees": [
                    {":name": "A", ":age": 1},
                    {":name": "B", ":age": 2},
                ],
                ":hq": {":city": "Boston"},
            }
        ]
    )
    got = eng.query_rows(
        {
            "find": ["?emp-name"],
            "where": [
                ["?corp", ":name", "Corp"],
                ["?corp", ":employees", "?emp"],
                ["?emp", ":name", "?emp-name"],
            ],
        }
    )
    assert sorted(got) == [("A",), ("B",)]
    got2 = eng.query_rows(
        {
            "find": ["?city"],
            "where": [["?corp", ":name", "Corp"], ["?corp", ":hq", "?h"], ["?h", ":city", "?city"]],
        }
    )
    assert got2 == [("Boston",)]


def test_cardinality_one_rewrite(eng):
    r = eng.transact([["add", "e", ":status", "draft"]])
    eid = r["tempids"]["e"]
    eng.transact([["add", eid, ":status", "live"]])
    # no schema -> cardinality one -> latest assertion wins
    assert eng.query_rows({"find": ["?s"], "where": [[eid, ":status", "?s"]]}) == [("live",)]


def test_user_transform_and_report_filter(eng):
    # reference transact_test.clj:116-141: username+password statements
    # become a salted user record; salt is redacted from the report
    report = eng.transact(
        [
            [":unifydb/add", "my-user", ":unifydb/username", "user"],
            [":unifydb/add", "my-user", ":unifydb/password", "pencil"],
        ]
    )
    facts = report["tx_data"]
    attrs = sorted(f[1] for f in facts)
    assert attrs == ["unifydb/password", "unifydb/txInstant", "unifydb/username"]
    pw = next(f[2] for f in facts if f[1] == "unifydb/password")
    assert pw != "pencil"  # hashed, never stored in clear
    # salt IS stored (queryable), just not reported
    from unifydb_spark.auth import get_user, verify_password

    user = get_user(eng, "user")
    assert user is not None
    assert verify_password("pencil", user["unifydb/salt"], user["unifydb/password"])
    assert not verify_password("wrong", user["unifydb/salt"], user["unifydb/password"])

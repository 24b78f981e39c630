"""JDBC fact-log backend against embedded Derby (reference S6: the KV
store's RDBMS flavor). Full write -> query -> time-travel -> retraction
round trip."""

import pytest

from unifydb_spark import Engine, FactStore, Ref
from unifydb_spark.sources.jdbc import JdbcBackend


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    db_dir = tmp_path_factory.mktemp("derby") / "factdb"
    backend = JdbcBackend(
        spark,
        f"jdbc:derby:{db_dir};create=true",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )
    return Engine(spark, FactStore(spark, backend=backend))


def test_jdbc_round_trip(eng):
    r1 = eng.transact([
        ["add", "ben", ":name", "Ben"],
        ["add", "ben", ":salary", 60000],
        ["add", "alyssa", ":name", "Alyssa"],
        ["add", "alyssa", ":supervisor", "ben"],
    ])
    ben = r1["tempids"]["ben"]
    rows = eng.query_rows({
        "find": ["?n", "?s"],
        "where": [["?e", ":name", "?n"], ["?e", ":salary", "?s"]],
    })
    assert rows == [("Ben", 60000)]
    # ref join through the database
    got = eng.query_rows({
        "find": ["?who"],
        "where": [["?e", ":supervisor", Ref(ben)], ["?e", ":name", "?who"]],
    })
    assert got == [("Alyssa",)]


def test_jdbc_retract_and_time_travel(eng):
    r = eng.transact([["add", "e", ":color", "red"]])
    eid, tx1 = r["tempids"]["e"], r["tempids"]["unifydb.tx"]
    eng.transact([[":unifydb/retract", eid, ":color", "red"]])
    q = {"find": ["?c"], "where": [[eid, ":color", "?c"]]}
    assert eng.query_rows(q) == []
    assert eng.query_rows(q, eng.db(tx1)) == [("red",)]

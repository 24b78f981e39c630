"""Pull (R15) conformance: the reference's doc-store-queries goldens
(test/unifydb/query_test.clj:521-576) in the Python surface syntax.

Divergence (documented in pull.py): cardinality-many lists are sorted by
canonical JSON for determinism under parallel scan; the reference inherits
B-tree insertion order. Assertions normalize list order.
"""

import pytest

from unifydb_spark import Engine, FactStore, Ref

DOC_FACTS = [
    (2, ":name", "Alice", 1, True),
    (2, ":favorite-color", "red", 1, True),
    (2, ":friends", Ref(3), 1, True),
    (2, ":friends", Ref(4), 1, True),
    (3, ":name", "Bob", 1, True),
    (3, ":favorite-color", "green", 1, True),
    (4, ":name", "Carl", 1, True),
    (4, ":favorite-color", "yellow", 1, True),
    (5, ":unifydb/schema", "friends", 1, True),
    (5, ":unifydb/cardinality", "cardinality/many", 1, True),
    (2, ":status", Ref(6), 1, True),
    (6, ":text", "Feeling good", 1, True),
    (4, ":status", Ref(7), 1, True),
    (7, ":text", "Feeling bad", 1, True),
]


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark, FactStore(spark).seed(DOC_FACTS))


def _norm(v):
    """Sort card-many lists by repr for order-insensitive comparison."""
    if isinstance(v, dict):
        return {k: _norm(x) for k, x in v.items()}
    if isinstance(v, list):
        return sorted((_norm(x) for x in v), key=repr)
    return v


def test_nested_pull(engine):
    # reference query_test.clj:543-557
    q = {
        "find": [
            (
                "pull",
                "?e",
                [
                    ":name",
                    ":favorite-color",
                    {":status": [":text"]},
                    {":friends": [":name", ":favorite-color", {":status": [":text"]}]},
                ],
            )
        ],
        "where": [["?e", ":name", "Alice"]],
    }
    rows = engine.query_rows(q)
    assert len(rows) == 1
    assert _norm(rows[0][0]) == _norm(
        {
            "name": "Alice",
            "favorite-color": "red",
            "status": {"text": "Feeling good"},
            "friends": [
                {"name": "Carl", "favorite-color": "yellow",
                 "status": {"text": "Feeling bad"}},
                {"name": "Bob", "favorite-color": "green"},
            ],
        }
    )


def test_pull_all_entities(engine):
    # reference query_test.clj:558-563
    q = {"find": [("pull", "?e", [":name"])], "where": [["?e", ":name", "_"]]}
    rows = sorted(engine.query_rows(q), key=repr)
    assert rows == [({"name": "Alice"},), ({"name": "Bob"},), ({"name": "Carl"},)]


def test_multi_pull(engine):
    # reference query_test.clj:564-570 (two pulls of the same entity)
    q = {
        "find": [
            ("pull", "?e", [":name"], "p1"),
            ("pull", "?e", [":favorite-color"], "p2"),
        ],
        "where": [["?e", "?a", "_"], [("=", "?e", Ref(2))]],
    }
    rows = set(map(repr, engine.query_rows(q)))
    assert rows == {repr(({"name": "Alice"}, {"favorite-color": "red"}))}


def test_pull_wildcard(engine):
    q = {"find": [("pull", "?e", ["*"])], "where": [["?e", ":name", "Bob"]]}
    rows = engine.query_rows(q)
    assert _norm(rows[0][0]) == {"favorite-color": "green", "name": "Bob"}


def test_pull_with_aggregate(engine):
    # pull + aggregate in one find: pull column groups with its entity var
    q = {
        "find": [("pull", "?e", [":name"]), ("count", "?f", "n_friends")],
        "where": [["?e", ":friends", "?f"]],
    }
    rows = engine.query_rows(q)
    assert rows == [({"name": "Alice"}, 2)]


def test_pull_missing_attr_entity_dropped(engine):
    # entity 6 has :text but no :name -> pulling [:name] yields {}
    q = {"find": ["?e", ("pull", "?e", [":name"], "p")],
         "where": [["?e", ":text", "Feeling good"]]}
    rows = engine.query_rows(q)
    assert rows == [(Ref(6), {})]

"""Aggregation + sort/limit + function-binding goldens
(reference test/unifydb/query_test.clj:312-519)."""

import pytest

from unifydb_spark import Engine, FactStore, Ref
from unifydb_spark.query.parse import QueryError

EMP_FACTS = [
    (1, ":employee/name", "Ben Bitdiddle", 0, True),
    (1, ":employee/age", 45, 0, True),
    (1, ":employee/role", ["computer", "wizard"], 0, True),
    (1, ":employee/nickname", "Bennie", 0, True),
    (2, ":employee/name", "Alyssa P. Hacker", 0, True),
    (2, ":employee/age", 32, 0, True),
    (2, ":employee/role", ["computer", "programmer"], 0, True),
    (2, ":employee/nickname", "Allie", 0, True),
    (3, ":employee/name", "Oliver Warbucks", 0, True),
    (3, ":employee/age", 56, 0, True),
    (3, ":employee/role", ["chief", "executive"], 0, True),
    (4, ":employee/name", "Lem E. Tweakit", 0, True),
    (4, ":employee/age", 32, 0, True),
    (4, ":employee/role", ["computer", "programmer"], 0, True),
]


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(spark, FactStore(spark).seed(EMP_FACTS))


def q1(eng, q):
    return eng.query_rows(q)


def test_sum(eng):
    assert q1(eng, {"find": [("sum", "?age")], "where": [["_", ":employee/age", "?age"]]}) == [(165,)]


def test_min_max(eng):
    assert q1(eng, {"find": [("min", "?age")], "where": [["_", ":employee/age", "?age"]]}) == [(32,)]
    assert q1(eng, {"find": [("max", "?age")], "where": [["_", ":employee/age", "?age"]]}) == [(56,)]


def test_counts(eng):
    assert q1(eng, {"find": [("count", "?name")], "where": [["_", ":employee/name", "?name"]]}) == [(4,)]
    # nickname is sparse: count counts non-nil bindings only
    assert q1(eng, {"find": [("count", "?nickname")], "where": [["_", ":employee/nickname", "?nickname"]]}) == [(2,)]
    assert q1(eng, {"find": [("count", "?role")], "where": [["_", ":employee/role", "?role"]]}) == [(4,)]
    assert q1(eng, {"find": [("count-distinct", "?role")], "where": [["_", ":employee/role", "?role"]]}) == [(3,)]


def test_group_by_role(eng):
    q = {
        "find": ["?role", ("min", "?age")],
        "where": [["?e", ":employee/role", "?role"], ["?e", ":employee/age", "?age"]],
    }
    assert sorted(q1(eng, q), key=str) == [
        (["chief", "executive"], 56),
        (["computer", "programmer"], 32),
        (["computer", "wizard"], 45),
    ]


def test_sort_by_agg(eng):
    q = {
        "find": ["?role", ("min", "?age")],
        "where": [["?e", ":employee/role", "?role"], ["?e", ":employee/age", "?age"]],
        "sort-by": ("min", "?age"),
    }
    assert q1(eng, q) == [
        (["computer", "programmer"], 32),
        (["computer", "wizard"], 45),
        (["chief", "executive"], 56),
    ]
    q_desc = dict(q, **{"sort-by": [("min", "?age"), "desc"]})
    assert q1(eng, q_desc) == [
        (["chief", "executive"], 56),
        (["computer", "wizard"], 45),
        (["computer", "programmer"], 32),
    ]


def test_sort_by_nonfind_var(eng):
    q = {
        "find": ["?name"],
        "where": [["?e", ":employee/name", "?name"], ["?e", ":employee/age", "?age"]],
        "sort-by": ["?age", "?name"],
    }
    assert q1(eng, q) == [
        ("Alyssa P. Hacker",),
        ("Lem E. Tweakit",),
        ("Ben Bitdiddle",),
        ("Oliver Warbucks",),
    ]
    assert q1(eng, dict(q, limit=2)) == [("Alyssa P. Hacker",), ("Lem E. Tweakit",)]


def test_sort_multi_key(eng):
    q = {
        "find": ["?role", "?name"],
        "where": [["?e", ":employee/role", "?role"], ["?e", ":employee/name", "?name"]],
        "sort-by": ["?role", "?name"],
    }
    assert q1(eng, q) == [
        (["chief", "executive"], "Oliver Warbucks"),
        (["computer", "programmer"], "Alyssa P. Hacker"),
        (["computer", "programmer"], "Lem E. Tweakit"),
        (["computer", "wizard"], "Ben Bitdiddle"),
    ]


def test_distinct(eng):
    got = q1(eng, {"find": [("distinct", "?role")], "where": [["_", ":employee/role", "?role"]]})
    assert len(got) == 1
    # reference returns a set; we return the sorted set-as-array
    assert sorted(got[0][0], key=str) == [
        ["chief", "executive"],
        ["computer", "programmer"],
        ["computer", "wizard"],
    ]


def test_mean_median_mode_stddev(eng):
    where = [["_", ":employee/age", "?age"]]
    # 165/4 (Clojure Ratio) -> 41.25 (documented divergence)
    assert q1(eng, {"find": [("mean", "?age")], "where": where}) == [(41.25,)]
    assert q1(eng, {"find": [("avg", "?age")], "where": where}) == [(41.25,)]
    # 77/2 -> 38.5
    assert q1(eng, {"find": [("median", "?age")], "where": where}) == [(38.5,)]
    assert q1(eng, {"find": [("mode", "?age")], "where": where}) == [([32],)]
    got = q1(eng, {"find": [("stddev", "?age")], "where": where})
    assert abs(got[0][0] - 11.586630226256467) < 1e-9


def test_unknown_aggregation(eng):
    with pytest.raises(QueryError) as ei:
        q1(eng, {"find": [("foo", "?age")], "where": [["_", ":employee/age", "?age"]]})
    assert ei.value.code == "unknown-aggregation"
    assert ei.value.info.get("aggregation") == "foo"


# --- function bindings (query_test.clj:449-519) -----------------------------

ORDER_FACTS = [
    (1, ":item/name", "Item 1", 0, True),
    (1, ":item/cost", 10, 0, True),
    (2, ":item/name", "Item 2", 0, True),
    (2, ":item/cost", 25, 0, True),
    (3, ":item/name", "Item 3", 0, True),
    (3, ":item/cost", 15, 0, True),
    (4, ":order/id", "123abc", 0, True),
    (5, ":line-item/item", Ref(1), 0, True),
    (5, ":line-item/quantity", 2, 0, True),
    (5, ":line-item/order", Ref(4), 0, True),
    (6, ":line-item/item", Ref(2), 0, True),
    (6, ":line-item/quantity", 1, 0, True),
    (6, ":line-item/order", Ref(4), 0, True),
    (7, ":line-item/item", Ref(3), 0, True),
    (7, ":line-item/quantity", 3, 0, True),
    (7, ":line-item/order", Ref(4), 0, True),
    (8, ":order/id", "456def", 0, True),
    (9, ":line-item/item", Ref(1), 0, True),
    (9, ":line-item/quantity", 1, 0, True),
    (9, ":line-item/order", Ref(8), 0, True),
    (10, ":line-item/item", Ref(2), 0, True),
    (10, ":line-item/quantity", 2, 0, True),
    (10, ":line-item/order", Ref(8), 0, True),
    (11, ":line-item/item", Ref(3), 0, True),
    (11, ":line-item/quantity", 1, 0, True),
    (11, ":line-item/order", Ref(8), 0, True),
]

REVENUE_Q = {
    "find": ["?order", ("sum", "?line-item-cost")],
    "where": [
        ["?o", ":order/id", "?order"],
        ["?li", ":line-item/order", "?o"],
        ["?li", ":line-item/item", "?i"],
        ["?li", ":line-item/quantity", "?q"],
        ["?i", ":item/cost", "?cost"],
        [("*", "?q", "?cost"), "?line-item-cost"],
    ],
}


@pytest.fixture(scope="module")
def order_eng(spark):
    return Engine(spark, FactStore(spark).seed(ORDER_FACTS))


def test_revenue_per_order(order_eng):
    got = sorted(order_eng.query_rows(REVENUE_Q))
    assert got == [("123abc", 90), ("456def", 75)]


def test_fnbind_unbound_var(order_eng):
    q = dict(REVENUE_Q)
    q["where"] = REVENUE_Q["where"][:-1] + [[("*", "?q", "?coost"), "?line-item-cost"]]
    with pytest.raises(QueryError) as ei:
        order_eng.query_rows(q)
    assert ei.value.code == "unbound-variable"
    assert ei.value.info.get("variable") == "coost"


def test_fnbind_unknown_function(order_eng):
    q = dict(REVENUE_Q)
    q["where"] = REVENUE_Q["where"][:-1] + [[("*foo", "?q", "?cost"), "?total"]]
    q["find"] = ["?order", ("sum", "?total")]
    with pytest.raises(QueryError) as ei:
        order_eng.query_rows(q)
    assert ei.value.code == "unknown-function"
    assert ei.value.info.get("function") == "*foo"


def test_approx_count_distinct(eng):
    # scale-path R9: HLL estimate within standard error of exact
    exact = eng.query_rows(
        {"find": [("count-distinct", "?v", "n")],
         "where": [["?e", ":employee/age", "?v"]]}
    )[0][0]
    approx = eng.query_rows(
        {"find": [("approx-count-distinct", "?v", "n")],
         "where": [["?e", ":employee/age", "?v"]]}
    )[0][0]
    assert abs(approx - exact) <= max(1, int(exact * 0.1))

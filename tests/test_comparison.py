"""cc-cmp parity for sequence values (reference
src/unifydb/comparison.clj:33-129): sequences compare element-wise with
the cross-class total order, shorter-prefix-first — NOT by their JSON
string representation. The engine realizes this as an order-preserving
byte encoding (values.cc_seq_sort_key); these goldens pin the order."""

import pytest

from unifydb_spark import Engine, FactStore
from unifydb_spark.values import _cc_key_bytes


def _reference_cc_cmp(x, y):
    """Driver-side reimplementation of cc-cmp for the property test
    (comparison-class alphabetical order; seqs element-wise, shorter
    first)."""
    def cls(v):
        if v is None:
            return ""
        if isinstance(v, bool):
            return "java.lang.Boolean"
        if isinstance(v, dict):
            return "clojure.lang.IPersistentMap"
        if isinstance(v, (list, tuple)):
            return "clojure.lang.Sequential"
        if isinstance(v, (int, float)):
            return "java.lang.Number"
        return "java.lang.String"

    cx, cy = cls(x), cls(y)
    if cx != cy:
        return -1 if cx < cy else 1
    if x is None and y is None:
        return 0
    if isinstance(x, dict):
        x, y = [list(p) for p in sorted(x.items())], [list(p) for p in sorted(y.items())]
        cx = cy = "clojure.lang.Sequential"
    if isinstance(x, (list, tuple)):
        for a, b in zip(x, y):
            c = _reference_cc_cmp(a, b)
            if c:
                return c
        return (len(x) > len(y)) - (len(x) < len(y))
    if isinstance(x, bool):
        return (x > y) - (x < y)
    return (x > y) - (x < y)


MIXED = [
    [2], [10], ["a"], [1, "b"], [True], [1, 2], [1, 2, 3], [1],
    ["a", 1], ["a", "b"], [[1], 2], [[1, 2]], [{"k": 1}], [{"k": 2}],
    [None, 1], [1.5], [-3], ["10"], ["9"], [], [False, 0],
]


def test_key_bytes_match_reference_order():
    import functools

    by_key = sorted(MIXED, key=_cc_key_bytes)
    by_cmp = sorted(MIXED, key=functools.cmp_to_key(_reference_cc_cmp))
    assert by_key == by_cmp


def test_key_bytes_property_random():
    import functools
    import random

    rnd = random.Random(11)

    def gen(depth=0):
        r = rnd.random()
        if depth < 3 and r < 0.3:
            return [gen(depth + 1) for _ in range(rnd.randrange(4))]
        if r < 0.5:
            return rnd.choice([-7, 0, 1, 2, 10, 1.5, -0.5])
        if r < 0.7:
            return rnd.choice(["", "a", "ab", "b", "10", "9"])
        if r < 0.8:
            return rnd.choice([True, False])
        if r < 0.9:
            return None
        return {"k": gen(depth + 1)}

    vals = [[gen() for _ in range(rnd.randrange(4))] for _ in range(120)]
    by_key = sorted(vals, key=_cc_key_bytes)
    by_cmp = sorted(vals, key=functools.cmp_to_key(_reference_cc_cmp))
    assert by_key == by_cmp


SEQ_FACTS = [
    (1, ":val", [2], 0, True),
    (2, ":val", [10], 0, True),
    (3, ":val", ["a"], 0, True),
    (4, ":val", [1, "b"], 0, True),
    (5, ":val", [True], 0, True),
    (6, ":val", [1, 2], 0, True),
]


@pytest.fixture(scope="module")
def seq_engine(spark):
    return Engine(spark, FactStore(spark).seed(SEQ_FACTS))


def test_engine_sorts_sequences_elementwise(seq_engine):
    """[true] < [1,2] < [1,"b"] < [2] < [10] < ["a"] — Boolean < Number <
    String within elements, 2 < 10 numerically (the JSON-string order
    would wrongly give ["a"]-first and [10] < [2])."""
    out = seq_engine.query_rows(
        {"find": ["?v"], "where": [["_", ":val", "?v"]], "sort-by": ["?v"]}
    )
    assert [r[0] for r in out] == [
        [True], [1, 2], [1, "b"], [2], [10], ["a"],
    ]

"""Schema round-trip (reference test/unifydb/schema_test.clj)."""

import pytest

from unifydb_spark import Engine, FactStore
from unifydb_spark.schema import get_schemas


def test_get_schemas(spark):
    eng = Engine(spark, FactStore(spark))
    eng.transact([
        [":unifydb/add", "foo", ":unifydb/schema", ":foo"],
        [":unifydb/add", "foo", ":unifydb/cardinality", ":cardinality/many"],
        [":unifydb/add", "bar", ":unifydb/schema", ":bar"],
        [":unifydb/add", "bar", ":unifydb/unique", ":unique/upsert"],
    ])
    got = get_schemas(eng, ["foo", "bar", "baz"])
    assert got == {
        "foo": {"unifydb/cardinality": "cardinality/many",
                "unifydb/schema": "foo"},
        "bar": {"unifydb/unique": "unique/upsert", "unifydb/schema": "bar"},
    }
    assert get_schemas(eng, []) == {}

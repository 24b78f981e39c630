"""Schema lookup API (reference src/unifydb/schema.clj).

`get_schemas` issues the same generated Datalog query the reference builds
(make-schema-query schema.clj:5-15: one :or branch per attribute) and
shapes the rows into {attr: {schema-attr: value}}. The reference's
"TODO add caching" (schema.clj:17) is addressed at the store layer —
cardinality lookups are cached per (backend version, tx) in
FactStore.cardinality_many_attrs.
"""

from __future__ import annotations

from typing import Optional

from unifydb_spark.store import norm_attr


def make_schema_query(attrs: list[str]) -> dict:
    """The reference's generated query, in the Python surface syntax."""
    branches = [
        [
            "and",
            ["?e", ":unifydb/schema", norm_attr(a)],
            ["?e", ":unifydb/schema", "?schema"],
            ["?e", "?attr", "?val"],
        ]
        for a in attrs
    ]
    return {"find": ["?schema", "?attr", "?val"], "where": [["or"] + branches]}


def get_schemas(engine, attrs: list[str], db: Optional[object] = None) -> dict:
    """Schema entities of `attrs` (as of the db snapshot), as
    {attr: {schema-attr: value}}; attrs without schema entities are
    absent (reference schema_test.clj golden)."""
    if not attrs:
        return {}
    rows = engine.query_rows(make_schema_query(attrs), db)
    out: dict = {}
    for schema, attr, val in rows:
        out.setdefault(schema, {})[attr] = val
    return out

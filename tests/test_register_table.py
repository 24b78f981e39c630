"""Generic table registration: any DataFrame becomes entities in the
Datalog surface, with the same pivot/pushdown fast paths."""

import pytest

from unifydb_spark import Engine, FactStore
from unifydb_spark.sources.tables import TableFactView


def test_register_custom_tables(spark):
    view = TableFactView(spark)  # no sf_dir: empty registry
    cats = spark.createDataFrame(
        [(1, "tools"), (2, "toys")], "cat_id bigint, cat_name string"
    )
    prods = spark.createDataFrame(
        [(10, "hammer", 9.99, 1), (11, "doll", 4.5, 2), (12, "saw", 19.0, 1)],
        "prod_id bigint, prod_name string, price double, cat_id bigint",
    )
    view.register_table(
        "category", cats, "cat_id", [("category/name", "cat_name", None)]
    )
    view.register_table(
        "product",
        prods,
        "prod_id",
        [
            ("product/name", "prod_name", None),
            ("product/price", "price", None),
            ("product/category", "cat_id", "category"),
        ],
    )
    eng = Engine(spark, FactStore(spark, backend=view))
    rows = sorted(
        eng.query_rows(
            {
                "find": ["?pn", "?cn"],
                "where": [
                    ["?p", ":product/name", "?pn"],
                    ["?p", ":product/price", "?price"],
                    [(">", "?price", 5.0)],
                    ["?p", ":product/category", "?c"],
                    ["?c", ":category/name", "?cn"],
                ],
            }
        )
    )
    assert rows == [("hammer", "tools"), ("saw", "tools")]


def test_register_alongside_builtin(spark):
    view = TableFactView(spark, "/root/testdata/sf0.001")
    tiers = spark.createDataFrame(
        [(0, "gold"), (1, "silver")], "tier_id bigint, tier_name string"
    )
    view.register_table(
        "tier", tiers, "tier_id", [("tier/name", "tier_name", None)]
    )
    eng = Engine(spark, FactStore(spark, backend=view))
    # custom entities coexist with the TPC-H ones (distinct id bases)
    assert view.base_of("tier") > view.base_of("embeddings")
    rows = eng.query_rows(
        {"find": ["?t"], "where": [["?e", ":tier/name", "?t"]]}
    )
    assert sorted(rows) == [("gold",), ("silver",)]


def test_csv_and_json_sources_through_register_table(spark, tmp_path):
    """Source-format breadth: CSV and JSONL files land in the Datalog
    surface through register_table exactly like parquet — the fact view
    is format-agnostic (anything spark.read produces)."""
    csv_path = str(tmp_path / "regions.csv")
    with open(csv_path, "w") as f:
        f.write("rid,rname\n1,NORTH\n2,SOUTH\n")
    json_path = str(tmp_path / "cities.jsonl")
    with open(json_path, "w") as f:
        f.write('{"cid": 10, "city": "oslo", "rid": 1}\n')
        f.write('{"cid": 11, "city": "perth", "rid": 2}\n')
        f.write('{"cid": 12, "city": "bergen", "rid": 1}\n')

    regions = spark.read.option("header", True).option(
        "inferSchema", True
    ).csv(csv_path)
    cities = spark.read.json(json_path)

    view = TableFactView(spark)
    view.register_table(
        "region2", regions, "rid", [("region2/name", "rname", None)]
    )
    view.register_table(
        "city", cities, "cid",
        [("city/name", "city", None), ("city/region", "rid", "region2")],
    )
    eng = Engine(spark, FactStore(spark, backend=view))
    rows = sorted(
        eng.query_rows(
            {
                "find": ["?city", "?rname"],
                "where": [
                    ["?c", ":city/name", "?city"],
                    ["?c", ":city/region", "?r"],
                    ["?r", ":region2/name", "?rname"],
                ],
            }
        )
    )
    assert rows == [("bergen", "NORTH"), ("oslo", "NORTH"), ("perth", "SOUTH")]

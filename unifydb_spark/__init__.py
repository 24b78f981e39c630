"""unifydb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of unifydb/unifydb (a time-traveling deductive
graph database), rebuilt Spark-first.

Facts live in an append-only EAVT DataFrame (parquet-backed or virtual views
over columnar tables); the Datalog query language compiles directly to
DataFrame plans so Catalyst provides pushdown, join ordering and distributed
execution. See SURVEY.md for the capability map (reference file:line cites
appear in module docstrings).
"""

from unifydb_spark.values import Ref, FACT_SCHEMA
from unifydb_spark.store import FactStore, Db, LATEST
from unifydb_spark.engine import Engine

__all__ = ["Ref", "FACT_SCHEMA", "FactStore", "Db", "LATEST", "Engine"]

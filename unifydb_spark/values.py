"""Typed-value codec for the facts table.

The reference stores arbitrary EDN values in the fact's value position
(survey §1.1; reference src/unifydb/facts.clj:3-26). Spark has no
dynamically-typed column, so a value is a *union type*: a `v_type` tag plus
one non-null typed column. Nested vectors (reference
test/unifydb/query_test.clj:19 — ``[:slumerville [:ridge :road] 10]``) are
canonical-JSON encoded into `v_json`; entity references get their own
`v_ref` column so ref-joins (VAET semantics, reference
src/unifydb/storage.clj:23-27) stay JVM-native long==long equi-joins.

Design note (100 TB): the typed columns are all scalar parquet-native types,
so scans prune to exactly the columns a query touches and predicates push
down; only deep nested-pattern unification ever leaves the JVM.
"""

from __future__ import annotations

import datetime as _dt
import json
import math
from typing import Any

from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


class Ref(int):
    """An entity-id reference value (the reference's boxed ID type,
    src/unifydb/id.clj:3-26). Behaves as an int; the subclass tag routes
    encoding to the `v_ref` column so graph joins are long==long."""

    def __repr__(self) -> str:  # pragma: no cover
        return f"Ref({int(self)})"


# v_type tags
T_LONG = "long"
T_DOUBLE = "double"
T_STRING = "string"
T_BOOL = "bool"
T_REF = "ref"
T_TS = "ts"
T_JSON = "json"
T_NULL = "null"

# Cross-type total order (reference cc-cmp, src/unifydb/comparison.clj:91-129:
# class-name rank then within-type compare). Rank numbers are arbitrary but
# stable; numbers (long/double) share a rank so they compare numerically.
TYPE_RANK = {
    T_NULL: 0,
    T_BOOL: 1,
    T_LONG: 2,
    T_DOUBLE: 2,
    T_REF: 3,
    T_TS: 4,
    T_STRING: 5,
    T_JSON: 6,
}

V_COLS = ["v_type", "v_long", "v_double", "v_str", "v_bool", "v_ref", "v_ts", "v_json"]

FACT_SCHEMA = StructType(
    [
        StructField("e", LongType(), False),
        StructField("a", StringType(), False),
        StructField("v_type", StringType(), False),
        StructField("v_long", LongType(), True),
        StructField("v_double", DoubleType(), True),
        StructField("v_str", StringType(), True),
        StructField("v_bool", BooleanType(), True),
        StructField("v_ref", LongType(), True),
        StructField("v_ts", TimestampType(), True),
        StructField("v_json", StringType(), True),
        StructField("tx", LongType(), False),
        StructField("added", BooleanType(), False),
    ]
)

_EMPTY = {
    "v_long": None,
    "v_double": None,
    "v_str": None,
    "v_bool": None,
    "v_ref": None,
    "v_ts": None,
    "v_json": None,
}


def canonical_json(v: Any) -> str:
    """Deterministic JSON for nested sequence values (sorted keys, no spaces)."""
    return json.dumps(v, sort_keys=True, separators=(",", ":"), default=_json_default)


def _json_default(v: Any):
    if isinstance(v, Ref):
        return {"$ref": int(v)}
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    raise TypeError(f"not JSON-encodable in a fact value: {v!r}")


def encode_value(v: Any) -> dict:
    """Python value -> {v_type, v_long, ...} column dict (exactly one typed
    column non-null, per FIXTURES.md §A)."""
    out = dict(_EMPTY)
    if v is None:
        out["v_type"] = T_NULL
    elif isinstance(v, Ref):
        out["v_type"] = T_REF
        out["v_ref"] = int(v)
    elif isinstance(v, bool):  # before int: bool subclasses int
        out["v_type"] = T_BOOL
        out["v_bool"] = v
    elif isinstance(v, int):
        out["v_type"] = T_LONG
        out["v_long"] = v
    elif isinstance(v, float):
        if math.isnan(v):
            raise ValueError("NaN fact values are not supported")
        out["v_type"] = T_DOUBLE
        out["v_double"] = v
    elif isinstance(v, str):
        out["v_type"] = T_STRING
        out["v_str"] = v
    elif isinstance(v, _dt.datetime):
        out["v_type"] = T_TS
        out["v_ts"] = v
    elif isinstance(v, (list, tuple)):
        out["v_type"] = T_JSON
        out["v_json"] = canonical_json(list(v))
    else:
        raise TypeError(f"unsupported fact value type: {type(v).__name__}")
    return out


def decode_value(v_type: str, row: Any) -> Any:
    """Typed columns -> Python value (inverse of encode_value)."""
    if v_type == T_NULL:
        return None
    if v_type == T_LONG:
        return row["v_long"]
    if v_type == T_DOUBLE:
        return row["v_double"]
    if v_type == T_STRING:
        return row["v_str"]
    if v_type == T_BOOL:
        return row["v_bool"]
    if v_type == T_REF:
        return Ref(row["v_ref"])
    if v_type == T_TS:
        return row["v_ts"]
    if v_type == T_JSON:
        return json.loads(row["v_json"])
    raise ValueError(f"unknown v_type {v_type!r}")


def decode_json_value(v: Any) -> Any:
    """Decode $ref wrappers out of a parsed v_json structure (recursing into
    objects too — pull results are nested entity maps)."""
    if isinstance(v, dict):
        if set(v) == {"$ref"}:
            return Ref(v["$ref"])
        return {k: decode_json_value(x) for k, x in v.items()}
    if isinstance(v, list):
        return [decode_json_value(x) for x in v]
    return v


# Typed column a value of each type naturally lives in.
NATURAL_COL = {
    T_LONG: "v_long",
    T_DOUBLE: "v_double",
    T_STRING: "v_str",
    T_BOOL: "v_bool",
    T_REF: "v_ref",
    T_TS: "v_ts",
    T_JSON: "v_json",
}


def value_struct_col():
    """All typed columns as one struct — the compiler's representation for
    variables whose type cannot be statically inferred. Struct equality
    gives correct unification across types; ordering uses type_rank first
    (cc-cmp total order)."""
    return F.struct(
        F.col("v_type").alias("t"),
        F.col("v_long").alias("l"),
        F.col("v_double").alias("d"),
        F.col("v_str").alias("s"),
        F.col("v_bool").alias("b"),
        F.col("v_ref").alias("r"),
        F.col("v_ts").alias("ts"),
        F.col("v_json").alias("j"),
    )


def struct_sort_keys(col):
    """Sort keys implementing the reference's cross-type total order
    (cc-cmp, src/unifydb/comparison.clj:91-129) over a value struct column.

    cc-cmp orders values first by comparison-class NAME (alphabetical,
    comparison.clj:7-31): nil "" < collections (clojure.lang.*) <
    java.lang.Boolean < java.lang.Number < java.lang.String < timestamps
    (java.time/util.*). Entity ids are plain Numbers in the reference, so
    refs sort WITH longs/doubles, not as a separate class. Within
    sequences, comparison is element-wise typed (cmp-seq-lexi) — realized
    here by `cc_seq_sort_key`'s order-preserving byte encoding."""
    rank = (
        F.when(col["t"] == T_NULL, F.lit(0))
        .when(col["t"] == T_JSON, F.lit(1))
        .when(col["t"] == T_BOOL, F.lit(2))
        .when(col["t"].isin(T_LONG, T_DOUBLE, T_REF), F.lit(3))
        .when(col["t"] == T_STRING, F.lit(4))
        .otherwise(F.lit(5))  # timestamps
    )
    num = F.coalesce(col["l"].cast("double"), col["d"], col["r"].cast("double"))
    return [rank, cc_seq_sort_key(col["j"]), col["b"], num, col["s"], col["ts"]]


# -- cc-cmp order-preserving byte encoding for sequence values -------------
#
# cmp-seq-lexi / cmp-vec-lexi (comparison.clj:33-90) compare sequences
# element-wise with cc-cmp recursively, shorter-prefix-first. A bytewise
# comparison of these encodings yields exactly that order, so Spark can
# sort JSON sequence values with one binary sort key instead of a
# driver-side comparator.
#
# Element tags follow the alphabetical comparison-class order above;
# 0x00 is reserved as the end-of-sequence terminator, which sorts below
# every tag — that is precisely "shorter comes first".

_TAG_NULL, _TAG_MAP, _TAG_SEQ, _TAG_BOOL, _TAG_NUM, _TAG_STR = (
    b"\x01", b"\x02", b"\x03", b"\x04", b"\x05", b"\x06"
)


def _cc_key_bytes(v: Any) -> bytes:
    import struct as _struct

    if v is None:
        return _TAG_NULL
    if isinstance(v, bool):
        return _TAG_BOOL + (b"\x01" if v else b"\x00")
    if isinstance(v, dict):
        if set(v) == {"$ref"}:  # refs are Numbers in the reference
            return _cc_key_bytes(v["$ref"])
        # maps compare as sequences of [key val] pairs sorted by key
        items = sorted(v.items())
        return _TAG_MAP + b"".join(
            _cc_key_bytes([k, x]) for k, x in items
        ) + b"\x00"
    if isinstance(v, (list, tuple)):
        return _TAG_SEQ + b"".join(_cc_key_bytes(x) for x in v) + b"\x00"
    if isinstance(v, (int, float)):
        # IEEE-754 big-endian with the sign-flip transform: bytewise
        # order == numeric order (ints above 2^53 collapse to doubles —
        # the same loss Clojure's cross-type number compare tolerates)
        i = int.from_bytes(_struct.pack(">d", float(v)), "big")
        i = i ^ 0xFFFFFFFFFFFFFFFF if i & (1 << 63) else i | (1 << 63)
        return _TAG_NUM + i.to_bytes(8, "big")
    if isinstance(v, str):
        # UTF-8 is code-point order-preserving; escape 0x00/0x01 so the
        # 0x00 terminator keeps the prefix property
        raw = v.encode("utf-8").replace(b"\x01", b"\x01\x02").replace(
            b"\x00", b"\x01\x01"
        )
        return _TAG_STR + raw + b"\x00"
    raise ValueError(f"cc-cmp key: unsupported value {type(v).__name__}")


@F.pandas_udf(BinaryType())
def cc_seq_sort_key(s):
    """Binary sort key over a v_json column: bytewise order == cc-cmp
    element-wise order. Null JSON -> null key (Spark sorts nulls first,
    matching nil-first)."""
    return s.map(
        lambda vj: None if vj is None else _cc_key_bytes(json.loads(vj))
    )


def normalize_event_ts(df, col: str = "ts"):
    """Normalize the events table's `ts` column to TimestampType.

    The driver's testdata has shipped two encodings of event time across
    rounds: INT64 nanoseconds (surfaced as bigint under
    spark.sql.legacy.parquet.nanosAsLong) and parquet timestamp[us]
    (surfaced as TIMESTAMP_NTZ). Both must produce the same TimestampType
    column; the session timezone is UTC so the NTZ->LTZ cast preserves
    the wall clock DuckDB sees.
    """
    dt = dict(df.dtypes)[col]
    if dt in ("bigint", "long", "int"):
        # integer DIV, not double division: nano values exceed double's
        # exact-integer range, so `/ 1000` would drift 1us on some rows
        return df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` DIV 1000")))
    if dt in ("timestamp_ntz", "date"):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    if dt != "timestamp":
        # fail FAST on an unknown vintage: a silent cast would produce
        # nulls and downstream queries would return empty instead of
        # erroring (exactly how the round-3 schema change manifested)
        raise ValueError(
            f"events.{col} has unsupported type {dt!r}; expected int64 "
            "nanos, timestamp[us]/ntz, or date — update normalize_event_ts"
        )
    return df

"""Pull — nested document projection (SURVEY R15).

Reference: src/unifydb/query/pull.clj. Its strategy (comment pull.clj:23-34)
is one batched subquery per pull expression over all matched entity ids,
then row re-nesting into maps/lists by attribute cardinality
(parse-pull-rows pull.clj:121-181). Nesting depth is static (it comes from
the spec), so the whole pull is a fixed join pipeline — no recursion at
execution time.

Spark-first shape: one pull *level* = snapshot facts semi-joined to the
entity-id set, each value rendered to canonical JSON JVM-side (same codec
as values.py), ref-attributes with sub-specs left-joined to the recursively
assembled sub-entity JSON, then two groupBys build the ``{"attr": value}``
object per entity (collect_list + array_sort + array_join — all
whole-stage-codegen builtins, no Python UDF anywhere).

Scale notes: each level is one shuffle on `e` (the assembly groupBy); the
id-set semi-join prunes the fact scan to exactly the pulled entities, and
attribute filters push down to the parquet scan. Depth-N pull = N such
stages, independent of row count.

Cardinality (reference fix-cardinalities pull.clj:148-169): card-many
attributes render as JSON arrays (sorted for determinism — the reference
inherits insertion order, which is not defined under parallel scan);
card-one as the bare value. Missing sub-entities render as ``{}``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from unifydb_spark.query.parse import QueryError, FindPull, Var
from unifydb_spark.store import Db, norm_attr


def _escape_json(c: Column) -> Column:
    """JSON-encode a scalar column JVM-side: to_json on a one-field struct,
    then strip the '{"v":' prefix and '}' suffix."""
    wrapped = F.to_json(F.struct(c.alias("v")))
    return F.substring(wrapped, F.lit(6), F.length(wrapped) - F.lit(6))


def _value_json() -> Column:
    """Fact typed-value columns -> canonical JSON (values.py codec)."""
    return (
        F.when(F.col("v_type") == "long", F.col("v_long").cast("string"))
        .when(F.col("v_type") == "double", _escape_json(F.col("v_double")))
        .when(F.col("v_type") == "string", _escape_json(F.col("v_str")))
        .when(
            F.col("v_type") == "bool",
            F.when(F.col("v_bool"), F.lit("true")).otherwise(F.lit("false")),
        )
        .when(
            F.col("v_type") == "ref",
            F.concat(F.lit('{"$ref":'), F.col("v_ref").cast("string"), F.lit("}")),
        )
        .when(
            F.col("v_type") == "ts",
            F.concat(
                F.lit('"'),
                F.date_format("v_ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"),
                F.lit('"'),
            ),
        )
        .when(F.col("v_type") == "json", F.col("v_json"))
        .otherwise(F.lit("null"))
    )


def _parse_spec(spec) -> tuple[list, dict, bool]:
    """Normalize a pull spec: [':attr', {'ref-attr': [subspec]}, '*'] ->
    (plain attrs, {ref attr: subspec}, wildcard?)."""
    plain: list[str] = []
    refs: dict[str, tuple] = {}
    wildcard = False
    for el in spec:
        if isinstance(el, str):
            if el == "*":
                wildcard = True
            else:
                plain.append(norm_attr(el))
        elif isinstance(el, dict):
            for k, sub in el.items():
                refs[norm_attr(str(k))] = tuple(sub)
        else:
            raise QueryError("invalid-pull", f"cannot parse pull spec element {el!r}")
    return plain, refs, wildcard


def pull_level(db: Db, ids_df: DataFrame, spec) -> DataFrame:
    """One pull level: (``__pe`` entity-id) -> (``__pe``, ``__pjson`` JSON
    object string). `ids_df` must have a single long column ``__pe``."""
    plain, refs, wildcard = _parse_spec(spec)
    if wildcard:
        facts = db.visible_facts()
    else:
        attrs = plain + list(refs)
        if not attrs:
            raise QueryError("invalid-pull", "empty pull spec")
        # union of per-attribute slices, NOT a filter over the whole fact
        # view: virtual-table backends serve each attribute as a narrow
        # column projection of one source table, so this keeps the scan
        # (and the logical plan) proportional to the spec, not the schema
        slices = [db.visible_facts(attr=a) for a in attrs]
        facts = slices[0]
        for s in slices[1:]:
            facts = facts.unionByName(s)
    facts = facts.join(ids_df, facts["e"] == ids_df["__pe"], "left_semi")
    base = facts.withColumn("__vj", _value_json())
    for attr, subspec in refs.items():
        sub_ids = (
            base.filter((F.col("a") == attr) & (F.col("v_type") == "ref"))
            .select(F.col("v_ref").alias("__pe"))
            .distinct()
        )
        sub = (
            pull_level(db, sub_ids, subspec)
            .withColumnRenamed("__pe", "__se")
            .withColumnRenamed("__pjson", "__sj")
        )
        base = (
            base.join(
                sub,
                (F.col("a") == attr) & (F.col("v_ref") == F.col("__se")),
                "left",
            )
            .withColumn(
                "__vj",
                F.when(
                    (F.col("a") == attr) & (F.col("v_type") == "ref"),
                    F.coalesce(F.col("__sj"), F.lit("{}")),
                ).otherwise(F.col("__vj")),
            )
            .drop("__se", "__sj")
        )
    # SINGLE groupBy per level: collect (attr, value-json) structs per
    # entity once, then do the per-attribute grouping/sorting INSIDE the
    # row with higher-order functions (the attr list is spec-sized, so
    # the O(attrs^2) row-local work is constant) — one shuffle per level,
    # not two nearly-identical ones on (e,a) then (e)
    many = sorted(db.cardinality_many_attrs())
    per_e = base.groupBy("e").agg(
        F.collect_list(F.struct(F.col("a"), F.col("__vj").alias("vj"))).alias("__avs")
    )
    attrs_arr = F.array_sort(
        F.array_distinct(F.transform(F.col("__avs"), lambda x: x["a"]))
    )

    def attr_val(a):
        vjs = F.array_sort(
            F.transform(
                F.filter(F.col("__avs"), lambda x: x["a"] == a),
                lambda x: x["vj"],
            )
        )
        if not many:
            return F.element_at(vjs, 1)
        return F.when(
            F.array_contains(F.array(*[F.lit(m) for m in many]), a),
            F.concat(F.lit("["), F.array_join(vjs, ","), F.lit("]")),
        ).otherwise(F.element_at(vjs, 1))

    kvs = F.transform(
        attrs_arr, lambda a: F.concat(_escape_json(a), F.lit(":"), attr_val(a))
    )
    return per_e.select(
        F.col("e").alias("__pe"),
        F.concat(F.lit("{"), F.array_join(kvs, ","), F.lit("}")).alias("__pjson"),
    )


def attach_pulls(db: Db, rel, parsed):
    """Join one assembled-JSON column per (pull ?e [spec]) find element into
    the compiled relation (reference do-pull, src/unifydb/query.clj:409-439 —
    there a recursive sub-query per pull; here a left join per pull)."""
    from unifydb_spark.query.compile import Rel, bt

    for f in parsed.find:
        if not isinstance(f, FindPull):
            continue
        if f.var.name not in rel.vars:
            raise QueryError(
                "unbound-variable",
                f"pull variable ?{f.var.name} is not bound",
                variables=[f.var.name],
            )
        if rel.vars[f.var.name] != "ref":
            raise QueryError(
                "invalid-pull", f"pull variable ?{f.var.name} must bind entity ids"
            )
        ids = rel.df.select(bt(f.var.name).alias("__pe")).distinct()
        pulled = pull_level(db, ids, f.spec)
        joined = rel.df.join(
            pulled, bt(f.var.name) == pulled["__pe"], "left"
        ).withColumn(f.alias, F.coalesce(F.col("__pjson"), F.lit("{}")))
        rel = Rel(joined.drop("__pe", "__pjson"), {**rel.vars, f.alias: "json"})
    return rel

"""Datalog clause tree -> DataFrame plan compiler.

Maps the reference's frame-stream evaluator `qeval`
(src/unifydb/query.clj:286-299) onto declarative DataFrame construction so
Catalyst supplies pushdown, join selection/ordering and distributed
execution (SURVEY §3 "Spark lifecycle mapping", §4):

 - fact pattern   -> filtered snapshot scan + projection (Q1, match-facts
                     query.clj:212-236; unification of repeated vars becomes
                     intra-row equality predicates)
 - :and           -> equi-join on shared variables (Q2, conjoin
                     query.clj:23-33); clause order is *not* execution order —
                     an analysis pass orders predicates/negation after their
                     generating clauses (mirroring the closed-world caveat,
                     query.clj:45-57) and Catalyst/AQE reorders the joins
 - :or            -> disjunctive-normal-form expansion + UNION ALL of branch
                     plans (Q3, disjoin query.clj:35-43; bag semantics)
 - :not           -> left-anti join on shared variables (Q4, negate
                     query.clj:58-68)
 - predicates     -> Column filters (Q5), function bindings -> withColumn
                     (Q6), both via the registry in functions.py
 - rule app       -> view expansion / semi-naive fixpoint (Q7, rules.py)
 - seq patterns   -> JSON-array unification; deep/rest patterns (Q9) use an
                     Arrow-batched pandas UDF (the only non-JVM path)

Variables carry a compile-time repr tag (long double string bool ref ts json
struct): monotyped attributes bind native parquet columns (JVM codegen path);
only statically untypeable positions fall back to a value struct. The
reference's boxed ID type (src/unifydb/id.clj:3-26) is repr 'ref' — a long
column that deliberately does not unify with plain longs, matching ID
equality semantics.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any, Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from unifydb_spark.store import Db
from unifydb_spark.values import (
    NATURAL_COL,
    Ref,
    canonical_json,
    encode_value,
    value_struct_col,
)
from unifydb_spark.query.parse import (
    And,
    FnBind,
    Not,
    Or,
    Pattern,
    Pred,
    QueryError,
    RuleApp,
    SeqPat,
    Var,
    WILDCARD,
)
from unifydb_spark.query import functions as fnreg

STRUCT_DDL = (
    "struct<t:string,l:bigint,d:double,s:string,b:boolean,r:bigint,"
    "ts:timestamp,j:string>"
)
REPR_DDL = {
    "long": "bigint",
    "double": "double",
    "string": "string",
    "bool": "boolean",
    "ref": "bigint",
    "ts": "timestamp",
    "json": "string",
    "struct": STRUCT_DDL,
}
# v_type tag a repr corresponds to (for struct promotion)
REPR_TAG = {
    "long": "long",
    "double": "double",
    "string": "string",
    "bool": "bool",
    "ref": "ref",
    "ts": "ts",
    "json": "json",
}
_STRUCT_FIELD = {
    "long": "l",
    "double": "d",
    "string": "s",
    "bool": "b",
    "ref": "r",
    "ts": "ts",
    "json": "j",
}


def bt(name: str) -> Column:
    return F.col("`" + name + "`")


@dataclass
class Rel:
    """A compiled relation: DataFrame whose columns are the bound logic
    variables (the reference's frame stream, one column per variable)."""

    df: DataFrame
    vars: dict  # var name -> repr tag

    def col(self, name: str) -> Column:
        return bt(name)


def empty_rel(spark, vars: dict) -> Rel:
    schema = ", ".join(f"`{n}` {REPR_DDL[r]}" for n, r in vars.items()) or "`__x` int"
    return Rel(spark.createDataFrame([], schema=schema), dict(vars))


def to_struct(c: Column, repr_: str) -> Column:
    if repr_ == "struct":
        return c
    tag = REPR_TAG[repr_]
    fields = []
    for r, fld in [
        ("long", "l"), ("double", "d"), ("string", "s"), ("bool", "b"),
        ("ref", "r"), ("ts", "ts"), ("json", "j"),
    ]:
        fields.append(
            (c if repr_ == r else F.lit(None).cast(REPR_DDL[r])).alias(fld)
        )
    return F.struct(F.lit(tag).alias("t"), *fields).alias("v")


def to_json_repr(c: Column, repr_: str) -> Column:
    """Promote a typed column to the canonical-JSON string repr (for
    unification against values bound inside sequence patterns)."""
    if repr_ == "json":
        return c
    if repr_ == "long":
        return c.cast("string")
    if repr_ == "bool":
        return F.when(c, F.lit("true")).when(~c, F.lit("false"))
    if repr_ == "ref":
        return F.when(c.isNotNull(), F.concat(F.lit('{"$ref":'), c.cast("string"), F.lit("}")))
    if repr_ in ("string", "double"):
        # JSON-escape via to_json on a one-field struct, then strip the
        # '{"v":' prefix and '}' suffix
        wrapped = F.to_json(F.struct(c.alias("v")))
        return F.when(
            c.isNotNull(), F.substring(wrapped, F.lit(6), F.length(wrapped) - 6)
        )
    if repr_ == "ts":
        return F.when(
            c.isNotNull(),
            F.concat(F.lit('"'), F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"), F.lit('"')),
        )
    if repr_ == "struct":
        return _struct_to_json_udf()(c)
    raise QueryError("internal", f"cannot json-promote repr {repr_}")


_S2J = None


def _struct_to_json_udf():
    global _S2J
    if _S2J is None:

        @F.pandas_udf("string")
        def s2j(s: pd.DataFrame) -> pd.Series:
            out = []
            for row in s.itertuples(index=False):
                t = row.t
                if t is None:
                    out.append(None)
                elif t == "long":
                    out.append(json.dumps(int(row.l)))
                elif t == "double":
                    out.append(json.dumps(float(row.d)))
                elif t == "string":
                    out.append(json.dumps(row.s))
                elif t == "bool":
                    out.append(json.dumps(bool(row.b)))
                elif t == "ref":
                    out.append('{"$ref":%d}' % int(row.r))
                elif t == "ts":
                    out.append(json.dumps(row.ts.isoformat()))
                elif t == "json":
                    out.append(row.j)
                else:
                    out.append(None)
            return pd.Series(out)

        _S2J = s2j
    return _S2J


def unify_condition(lc: Column, lrepr: str, rc: Column, rrepr: str):
    """Equality condition between two variable columns, promoting reprs when
    they differ. Returns None when unification is statically impossible
    (strict typing: the reference's ID type and Clojure `=` are type-strict)."""
    if lrepr == rrepr:
        return lc == rc
    pair = {lrepr, rrepr}
    if "json" in pair:
        return to_json_repr(lc, lrepr) == to_json_repr(rc, rrepr)
    if "struct" in pair:
        return to_struct(lc, lrepr) == to_struct(rc, rrepr)
    return None


def merge_repr(r1: str, r2: str) -> str:
    if r1 == r2:
        return r1
    if "json" in (r1, r2):
        return "json"
    return "struct"


def promote_col(c: Column, from_repr: str, to_repr: str) -> Column:
    if from_repr == to_repr:
        return c
    if to_repr == "json":
        return to_json_repr(c, from_repr)
    if to_repr == "struct":
        return to_struct(c, from_repr)
    raise QueryError("internal", f"cannot promote {from_repr} -> {to_repr}")


def join_rels(left: Optional[Rel], right: Rel, how: str = "inner") -> Rel:
    if left is None:
        return right
    shared = [n for n in right.vars if n in left.vars]
    spark = left.df.sparkSession
    if not shared:
        if how == "inner":
            return Rel(left.df.crossJoin(right.df), {**left.vars, **right.vars})
        # anti-join with no shared vars: left survives iff right is empty
        rdf = right.df.select(F.lit(1).alias("__one")).limit(1)
        out = left.df.join(F.broadcast(rdf), F.lit(True), "left_anti")
        return Rel(out, dict(left.vars))
    rdf = right.df
    for n in shared:
        rdf = rdf.withColumnRenamed(n, f"__r_{n}")
    conds = []
    for n in shared:
        c = unify_condition(bt(n), left.vars[n], bt(f"__r_{n}"), right.vars[n])
        if c is None:  # statically impossible unification
            if how == "inner":
                return empty_rel(spark, {**left.vars, **{k: v for k, v in right.vars.items() if k not in left.vars}})
            if how == "left_semi":  # semi against the impossible = empty
                return Rel(left.df.limit(0), dict(left.vars))
            return left  # anti-join against the empty set keeps everything
        conds.append(c)
    cond = conds[0]
    for c in conds[1:]:
        cond = cond & c
    joined = left.df.join(rdf, cond, how)
    if how == "inner":
        joined = joined.drop(*[f"__r_{n}" for n in shared])
        return Rel(joined, {**left.vars, **{k: v for k, v in right.vars.items() if k not in left.vars}})
    return Rel(joined, dict(left.vars))


# ---------------------------------------------------------------------------
# sequence-pattern (Q9) unification


def seqpat_to_value(sp: SeqPat):
    out = []
    for it in sp.items:
        if isinstance(it, SeqPat):
            out.append(seqpat_to_value(it))
        elif isinstance(it, (Var,)) or it is WILDCARD:
            raise QueryError("internal", "seqpat_to_value on non-ground pattern")
        else:
            out.append(it)
    return out


def _serialize_seqpat(sp: SeqPat):
    items = []
    for it in sp.items:
        if isinstance(it, Var):
            items.append({"$var": it.name})
        elif it is WILDCARD:
            items.append({"$var": "_"})
        elif isinstance(it, SeqPat):
            items.append(_serialize_seqpat(it))
        elif isinstance(it, Ref):
            items.append({"$ref": int(it)})
        else:
            items.append(it)
    if sp.rest is None:
        rest = None
    elif isinstance(sp.rest, Var):
        rest = sp.rest.name
    else:  # '& _' anonymous rest
        rest = "_"
    return {"$seq": items, "$rest": rest}


def _seq_unify(pat, v, binds: dict) -> bool:
    """Unify a serialized seq pattern against a parsed JSON value
    (reference unify.clj:46-85 incl. '&' rest patterns :66-73). Bindings are
    stored as canonical JSON strings. Type-strict like Clojure `=`."""
    if isinstance(pat, dict) and "$var" in pat:
        name = pat["$var"]
        if name == "_":
            return True
        cj = canonical_json(v)
        if name in binds:
            return binds[name] == cj
        binds[name] = cj
        return True
    if isinstance(pat, dict) and "$seq" in pat:
        if not isinstance(v, list):
            return False
        items, rest = pat["$seq"], pat["$rest"]
        if (rest is None and len(v) != len(items)) or len(v) < len(items):
            return False
        for pi, vi in zip(items, v):
            if not _seq_unify(pi, vi, binds):
                return False
        if rest is not None and rest != "_":
            cj = canonical_json(v[len(items):])
            if rest in binds:
                return binds[rest] == cj
            binds[rest] = cj
        return True
    if isinstance(pat, bool) != isinstance(v, bool):
        return False
    if isinstance(pat, (int, float)) and not isinstance(pat, bool):
        return isinstance(v, (int, float)) and not isinstance(v, bool) \
            and type(pat) is type(v) and pat == v
    return pat == v


def make_seq_unify_udf(pattern_json: str):
    pat = json.loads(pattern_json)

    @F.pandas_udf("map<string,string>")
    def u(s: pd.Series) -> pd.Series:
        def run(vj):
            if vj is None:
                return None
            try:
                v = json.loads(vj)
            except (ValueError, TypeError):
                return None
            binds: dict = {}
            return binds if _seq_unify(pat, v, binds) else None

        return s.map(run)

    return u


# ---------------------------------------------------------------------------
# pattern compilation (Q1)


def infer_value_repr(db: Db, attr: Optional[str]) -> str:
    """Static type inference for a value-position variable: monotyped
    attributes bind their native typed column (the JVM fast path)."""
    if attr is None:
        return "struct"
    types = db.attr_types().get(attr)
    if types and len(types) == 1:
        t = next(iter(types))
        if t in REPR_TAG.values() and t != "null":
            return t
    return "struct"


def compile_pattern(db: Db, pat: Pattern) -> Rel:
    attr = pat.a if isinstance(pat.a, str) else None
    df = db.visible_facts(attr=attr)
    conds: list[Column] = []
    # var name -> (source Column, repr); first occurrence binds, repeats filter
    proj: dict[str, tuple] = {}
    repeats: list[tuple] = []

    def bind(var: Var, col: Column, repr_: str):
        if var.name in proj:
            repeats.append((proj[var.name], (col, repr_)))
        else:
            proj[var.name] = (col, repr_)

    # e position
    if isinstance(pat.e, Var):
        bind(pat.e, F.col("e"), "ref")
    elif pat.e is not WILDCARD:
        if not isinstance(pat.e, (int, Ref)) or isinstance(pat.e, bool):
            raise QueryError("invalid-pattern", f"entity must be an id: {pat.e!r}")
        conds.append(F.col("e") == int(pat.e))
    # a position
    if isinstance(pat.a, Var):
        bind(pat.a, F.col("a"), "string")
    # v position
    seq_udf_pat = None
    if isinstance(pat.v, Var):
        repr_ = infer_value_repr(db, attr)
        col = value_struct_col() if repr_ == "struct" else F.col(NATURAL_COL[repr_])
        if repr_ == "struct":
            bind(pat.v, col, "struct")
        else:
            conds.append(F.col("v_type") == repr_)
            bind(pat.v, col, repr_)
    elif isinstance(pat.v, SeqPat):
        if pat.v.is_ground():
            conds.append(F.col("v_type") == "json")
            conds.append(F.col("v_json") == canonical_json(seqpat_to_value(pat.v)))
        else:
            seq_udf_pat = json.dumps(_serialize_seqpat(pat.v))
            conds.append(F.col("v_type") == "json")
    elif pat.v is not WILDCARD:
        enc = encode_value(pat.v)
        conds.append(F.col("v_type") == enc["v_type"])
        if enc["v_type"] != "null":
            ncol = NATURAL_COL[enc["v_type"]]
            conds.append(F.col(ncol) == F.lit(enc[ncol]))
    # tx position
    if isinstance(pat.tx, Var):
        bind(pat.tx, F.col("tx"), "ref")
    elif pat.tx is not WILDCARD:
        conds.append(F.col("tx") == int(pat.tx))
    # added position
    if isinstance(pat.added, Var):
        bind(pat.added, F.col("added"), "bool")
    elif pat.added is not WILDCARD:
        conds.append(F.col("added") == bool(pat.added))

    for (c1, r1), (c2, r2) in repeats:
        c = unify_condition(c1, r1, c2, r2)
        conds.append(c if c is not None else F.lit(False))

    for c in conds:
        df = df.filter(c)

    vars_out: dict[str, str] = {}
    select_cols = []
    for name, (col, repr_) in proj.items():
        select_cols.append(col.alias(name))
        vars_out[name] = repr_

    if seq_udf_pat is not None:
        udf = make_seq_unify_udf(seq_udf_pat)
        df = df.withColumn("__binds", udf(F.col("v_json"))).filter(
            F.col("__binds").isNotNull()
        )
        seq_vars = [v for v in pat.v.vars() if v.name != "_"]
        for v in seq_vars:
            if v.name in vars_out:
                # var bound both inside the seq and at another position
                cond = unify_condition(
                    F.col("__binds")[v.name], "json",
                    proj[v.name][0], proj[v.name][1],
                )
                df = df.filter(cond if cond is not None else F.lit(False))
            else:
                select_cols.append(F.col("__binds")[v.name].alias(v.name))
                vars_out[v.name] = "json"
        df = df.select(*select_cols)
    else:
        df = df.select(*select_cols)
    return Rel(df, vars_out)


# ---------------------------------------------------------------------------
# conjunction scheduling + compilation (Q2, Q4, Q5, Q6 + §4.4 ordering)


def _clause_vars(c) -> set:
    if isinstance(c, PivotGroup):
        out = {c.evar}
        for p in c.patterns:
            out |= _clause_vars(p)
        return out
    if isinstance(c, Pattern):
        out = set()
        for _, t in c.positions:
            if isinstance(t, Var):
                out.add(t.name)
            elif isinstance(t, SeqPat):
                out.update(v.name for v in t.vars())
        return out - {"_"}
    if isinstance(c, Pred):
        return {a.name for a in c.args if isinstance(a, Var)}
    if isinstance(c, FnBind):
        s = {a.name for a in c.args if isinstance(a, Var)}
        if isinstance(c.out, Var):
            s.add(c.out.name)
        elif isinstance(c.out, SeqPat):
            s.update(v.name for v in c.out.vars())
        return s
    if isinstance(c, RuleApp):
        return {a.name for a in c.args if isinstance(a, Var)}
    if isinstance(c, Not):
        return _clause_vars(c.clause)
    if isinstance(c, And):
        out = set()
        for x in c.clauses:
            out |= _clause_vars(x)
        return out
    if isinstance(c, Or):
        out = set()
        for x in c.clauses:
            out |= _clause_vars(x)
        return out
    return set()


def _required_vars(c, generator_vars: set) -> set:
    """Variables that must be bound before this clause may run."""
    if isinstance(c, Pred):
        return {a.name for a in c.args if isinstance(a, Var)}
    if isinstance(c, FnBind):
        return {a.name for a in c.args if isinstance(a, Var)}
    if isinstance(c, Not):
        # negation-as-failure is a filter: only vars that some generating
        # clause can supply must be bound first (reference query.clj:45-57)
        return _clause_vars(c) & generator_vars
    return set()


@dataclass
class PivotGroup:
    """N fact patterns over one entity variable whose attributes co-locate
    in one source table, collapsed into a single wide scan (the EAV-pivot
    optimization — without it every additional attribute of an entity costs
    a self-join; with it a Datalog query over a table costs the same plan as
    the hand-written DataFrame pipeline)."""

    evar: str
    patterns: tuple


def _pivotable(db: Db, c) -> bool:
    return (
        isinstance(c, Pattern)
        and isinstance(c.e, Var)
        and isinstance(c.a, str)
        and c.tx is WILDCARD
        and c.added is WILDCARD
        and not isinstance(c.v, SeqPat)
    )


def _group_pivots(db: Db, clauses: list) -> list:
    backend = getattr(db.store, "backend", None)
    if (
        backend is None
        or not getattr(backend, "supports_pivot", False)
        or db.historical
        or (db.tx_id != "latest" and db.tx_id < backend.latest_tx())
    ):
        return clauses
    many = db.cardinality_many_attrs()
    groups: dict[str, list] = {}
    order: list = []
    for c in clauses:
        if _pivotable(db, c) and c.a not in many:
            groups.setdefault(c.e.name, []).append(c)
            order.append(("g", c.e.name))
        else:
            order.append(("c", c))
    out, emitted = [], set()
    for kind, item in order:
        if kind == "c":
            out.append(item)
        elif item not in emitted:
            emitted.add(item)
            pats = groups[item]
            if len(pats) >= 2 and backend.pivot_df([p.a for p in pats]) is not None:
                out.append(PivotGroup(item, tuple(pats)))
            else:
                out.extend(pats)
    return out


def compile_pivot_group(db: Db, g: PivotGroup) -> Rel:
    backend = db.store.backend
    pdf, attr_reprs = backend.pivot_df([p.a for p in g.patterns])
    conds: list = []
    proj: dict[str, tuple] = {g.evar: (F.col("e"), "ref")}
    for p in g.patterns:
        col = bt(p.a)
        repr_ = attr_reprs[p.a]
        if isinstance(p.v, Var):
            conds.append(col.isNotNull())
            if p.v.name in proj:
                c0, r0 = proj[p.v.name]
                c = unify_condition(col, repr_, c0, r0)
                conds.append(c if c is not None else F.lit(False))
            else:
                proj[p.v.name] = (col, repr_)
        elif p.v is WILDCARD:
            conds.append(col.isNotNull())
        else:
            enc = encode_value(p.v)
            if enc["v_type"] != repr_:
                conds.append(F.lit(False))
            else:
                conds.append(col == F.lit(enc[NATURAL_COL[repr_]]))
    df = pdf
    for c in conds:
        df = df.filter(c)
    select = [colspec.alias(name) for name, (colspec, _) in proj.items()]
    return Rel(df.select(*select), {n: r for n, (_, r) in proj.items()})


def _is_axiom_app(c, rules_env) -> bool:
    if not isinstance(c, RuleApp) or rules_env is None:
        return False
    rules = rules_env.by_name.get(c.name)
    return bool(rules) and all(not r.body.clauses for r in rules)


def compile_conj(db: Db, clauses: list, rules_env, seed: Optional[Rel] = None) -> Rel:
    clauses = _group_pivots(db, clauses)
    generator_vars: set = set(seed.vars) if seed else set()
    for c in clauses:
        if isinstance(c, (Pattern, RuleApp, PivotGroup)):
            generator_vars |= _clause_vars(c)
        elif isinstance(c, FnBind):
            if isinstance(c.out, Var):
                generator_vars.add(c.out.name)
            elif isinstance(c.out, SeqPat):
                generator_vars.update(v.name for v in c.out.vars())

    rel: Optional[Rel] = seed
    pending = list(clauses)
    while pending:
        bound = set(rel.vars) if rel else set()
        pick = None
        for i, c in enumerate(pending):
            req = _required_vars(c, generator_vars)
            if _is_axiom_app(c, rules_env):
                req = req | {a.name for a in c.args if isinstance(a, Var)}
            if req <= bound:
                pick = i
                break
        if pick is None:
            missing = sorted(_required_vars(pending[0], generator_vars) - bound)
            name = missing[0] if missing else "?"
            raise QueryError(
                "unbound-variable",
                f"Unbound variable {name}",  # parity: reference query.clj:85-91
                variable=name,
            )
        c = pending.pop(pick)
        rel = _apply_clause(db, rel, c, rules_env)
    if rel is None:
        raise QueryError("invalid-query", "empty :where")
    return rel


def _axiom_filter(rel: Rel, app: RuleApp, rules_env) -> Rel:
    """A rule application whose rules are all bodiless (axioms, reference
    rules.clj:3-7) over already-bound variables is a pure constraint: unify
    the call args with each head, OR the resulting conditions (the idiom is
    `[(same ?x ?x)]` used inside :not, test query_test.clj:133-141)."""
    rule_conds = []
    for rule in rules_env.by_name[app.name]:
        groups: dict[str, list] = {}
        conds: list = []
        ok = True
        for param, arg in zip(rule.params, app.args):
            if isinstance(arg, Var):
                a = (bt(arg.name), rel.vars[arg.name])
            elif arg is WILDCARD:
                a = None
            else:
                from unifydb_spark.query.functions import as_col

                a = as_col(arg)
            if isinstance(param, Var):
                if a is not None:
                    groups.setdefault(param.name, []).append(a)
            else:
                if a is not None:
                    from unifydb_spark.query.functions import as_col

                    pc, pr = as_col(param)
                    c = unify_condition(a[0], a[1], pc, pr)
                    if c is None:
                        ok = False
                        break
                    conds.append(c)
        if not ok:
            continue
        for members in groups.values():
            for (c1, r1), (c2, r2) in zip(members, members[1:]):
                c = unify_condition(c1, r1, c2, r2)
                conds.append(c if c is not None else F.lit(False))
        cond = F.lit(True)
        for c in conds:
            cond = cond & c
        rule_conds.append(cond)
    if not rule_conds:
        return Rel(rel.df.filter(F.lit(False)), dict(rel.vars))
    total = rule_conds[0]
    for c in rule_conds[1:]:
        total = total | c
    return Rel(rel.df.filter(total), dict(rel.vars))


def _apply_table_fn(db: Db, rel: Rel, c: FnBind, tf) -> Rel:
    """Relation-producing function binding — how extension operators
    (ANN search over a persisted IVF-PQ index, registered via
    Engine.register_table_fn) compose INTO the Datalog surface (VERDICT
    r11 ask #4; the reference's fn-bind pipelines,
    test/unifydb/query_test.clj:449-519, generalized from 1:1 scalar
    binds to 1:N relation binds).

    `[(ann-topk ?q 5) ?n]` compiles to: distinct bound values of ?q ->
    the registered table function returns a DataFrame (__tf_in,
    __tf_out) plus the output repr tag -> equi-join back on ?q, binding
    ?n once per produced row. The whole thing stays ONE Catalyst plan:
    the function's DataFrame is just another join input (for the ANN
    fn that input is a partition-pruned scan of the probed index
    buckets), so neighbors joined back to facts never leave the JVM.

    Contract: args[0] is either a bound variable (the key the function
    is evaluated over — evaluation is per distinct key, the same dedup
    any set-returning SQL UDTF applies) or a GROUND numeric seq literal
    (round-13, VERDICT r12 ask #4 — the ANN serving case queries a
    vector that is NOT in the corpus: `[(ann-topk [0.1 ...] 5) ?n]`
    hands the literal to the function as a one-row array<double>
    relation and broadcast-joins the produced rows onto the pattern
    pipeline; there is no key to join back on, the key IS the
    constant); remaining args are constants (knobs like k) or BOUND
    scalar variables (round-14, VERDICT r13 ask #5 — the reference's
    fn-binds allow any bound term in any position, query.clj:106-130:
    `[(ann-topk ?q ?k) ?n]` evaluates the function once per distinct
    parameter-value combination, tags each call's output with its combo,
    and joins back on key + parameters; see _apply_table_fn_var_params);
    the output must be a plain variable."""
    key = c.args[0]
    literal_key = None
    if isinstance(key, SeqPat):
        if key.rest is not None or any(
            isinstance(it, (Var, SeqPat)) or it is WILDCARD for it in key.items
        ):
            raise QueryError(
                "invalid-query",
                f"table function {c.fn} literal key must be a ground flat seq",
            )
        literal_key = list(key.items)
        if not literal_key or any(
            isinstance(it, bool) or not isinstance(it, (int, float))
            for it in literal_key
        ):
            raise QueryError(
                "invalid-query",
                f"table function {c.fn} literal key must be a non-empty "
                "numeric vector",
            )
    elif rel is None or not isinstance(key, Var) or key.name not in rel.vars:
        raise QueryError(
            "unbound-variable",
            f"table function {c.fn} needs its first argument bound",
        )
    rel_param_idx = frozenset(getattr(tf, "relation_params", ()))
    params: list = []
    param_vars: dict[int, Var] = {}
    rel_param_vars: dict[int, Var] = {}
    for i, a in enumerate(c.args[1:]):
        if i in rel_param_idx:
            # RELATION-valued parameter (round-15, VERDICT r14 ask #2):
            # the registered function declares (via its relation_params
            # attribute — indices into the arguments after the key) that
            # this position consumes the SET of values co-bound with the
            # key, not one scalar per call. Contract: the argument must
            # be a bound variable; the function receives the distinct
            # (key, value) pairs as a DataFrame (value-only for a
            # literal key); produced bindings join back on the KEY alone
            # — the set parameter is consumed, never row-correlated with
            # the binding rows it came from.
            if not isinstance(a, Var) or rel is None or a.name not in rel.vars:
                raise QueryError(
                    "unbound-variable",
                    f"table function {c.fn} relation parameter must be a "
                    "variable bound by an earlier clause",
                )
            rel_param_vars[i] = a
            params.append(None)  # filled with the pairs DataFrame below
        elif isinstance(a, Var):
            if rel is None or a.name not in rel.vars:
                raise QueryError(
                    "unbound-variable",
                    f"table function {c.fn} parameter ?{a.name} must be "
                    "bound by an earlier clause",
                )
            r = rel.vars[a.name]
            if r not in ("long", "double", "string", "bool", "ref"):
                raise QueryError(
                    "invalid-query",
                    f"table function {c.fn} parameter ?{a.name} must be "
                    f"scalar-typed (got repr {r})",
                )
            param_vars[i] = a
            params.append(None)  # filled per combo
        else:
            params.append(a)
    if rel_param_vars and param_vars:
        # per-combo evaluation would need the pairs re-derived per combo;
        # no current operator composes both — refuse loudly over silently
        # mis-scoping the set
        raise QueryError(
            "invalid-query",
            f"table function {c.fn} cannot mix relation-valued and "
            "variable scalar parameters",
        )
    for i, v in rel_param_vars.items():
        if literal_key is not None:
            pdf = rel.df.select(bt(v.name).alias("__tf_set")).distinct()
        else:
            pdf = rel.df.select(
                bt(key.name).alias("__tf_in"), bt(v.name).alias("__tf_set")
            ).distinct()
        params[i] = pdf
    out = c.out
    if not isinstance(out, Var):
        raise QueryError(
            "invalid-query",
            f"table function {c.fn} output must be a single variable",
        )
    if param_vars:
        return _apply_table_fn_var_params(
            db, rel, c, tf, key, literal_key, params, param_vars, out
        )
    if literal_key is not None:
        keys_df = db.store.spark.range(1).select(
            F.array(*[F.lit(float(x)) for x in literal_key]).alias("__tf_in")
        )
        out_df, _in_repr, out_repr = tf(db, keys_df, *params)
        # constant key: nothing to join back on — the (<= k)-row output
        # broadcast-joins onto every binding row, or simply IS the
        # relation when this is the first clause
        if rel is None:
            rel = Rel(out_df.drop("__tf_in", "__tf_out").limit(0), {})
            joined = out_df.drop("__tf_in")
        else:
            joined = rel.df.crossJoin(
                F.broadcast(out_df.drop("__tf_in"))
            )
    else:
        keys_df = rel.df.select(bt(key.name).alias("__tf_in")).distinct()
        out_df, in_repr, out_repr = tf(db, keys_df, *params)
        jcond = unify_condition(
            bt(key.name), rel.vars[key.name], F.col("__tf_in"), in_repr
        )
        # None = statically impossible key type; an always-false join
        # keeps the unified schema while producing the empty relation
        joined = rel.df.join(
            out_df, jcond if jcond is not None else F.lit(False)
        ).drop("__tf_in")
    return _bind_tf_out(rel, joined, out, out_repr)


def _bind_tf_out(rel: Rel, joined: DataFrame, out: Var, out_repr: str) -> Rel:
    if out.name in rel.vars:  # output already bound -> unify = filter
        cond = unify_condition(
            F.col("__tf_out"), out_repr, bt(out.name), rel.vars[out.name]
        )
        cond = cond if cond is not None else F.lit(False)
        return Rel(joined.filter(cond).drop("__tf_out"), dict(rel.vars))
    df = joined.withColumn(out.name, F.col("__tf_out")).drop("__tf_out")
    return Rel(df, {**rel.vars, out.name: out_repr})


# Bounded driver-side metadata: distinct parameter-value combinations are
# knobs (k, thresholds), not data — the cap turns a data-sized parameter
# column into a structured compile error instead of a driver-side blowup.
_TF_PARAM_COMBO_CAP = 64


def _apply_table_fn_var_params(
    db: Db,
    rel: Rel,
    c: FnBind,
    tf,
    key,
    literal_key,
    params: list,
    param_vars: "dict[int, Var]",
    out: Var,
) -> Rel:
    """Table-fn invocation with BOUND-VARIABLE parameters (VERDICT r13
    ask #5; the reference's fn-binds accept any bound term in any
    position, src/unifydb/query.clj:106-130).

    Semantics: the function is evaluated once per DISTINCT combination
    of the parameter variables' values (per-key dedup inside each call
    is unchanged), each call's keys are restricted to the rows that
    actually carry that combo, the outputs are tagged with their combo
    and unioned, and the union joins back on key + parameter columns —
    so `[(ann-topk ?q ?k) ?n]` binds each query's own-k neighbor list.

    Scale: the collected combos are knob metadata, capped at
    _TF_PARAM_COMBO_CAP (structured invalid-query beyond — a
    data-cardinality column is not a knob); rows whose parameter value
    is NULL produce no bindings (SQL predicate semantics)."""
    pv_names = [v.name for v in param_vars.values()]
    combo_rows = (
        rel.df.select(*[bt(n) for n in pv_names])
        .distinct()
        .limit(_TF_PARAM_COMBO_CAP + 1)
        .collect()
    )
    if len(combo_rows) > _TF_PARAM_COMBO_CAP:
        raise QueryError(
            "invalid-query",
            f"table function {c.fn} variable parameters take more than "
            f"{_TF_PARAM_COMBO_CAP} distinct value combinations — "
            "parameter variables are knobs, not data columns",
        )
    def _eval_combo(row):
        vals = {n: row[n] for n in pv_names}
        resolved = list(params)
        for i, v in param_vars.items():
            resolved[i] = vals[v.name]
        if literal_key is not None:
            keys_df = db.store.spark.range(1).select(
                F.array(*[F.lit(float(x)) for x in literal_key]).alias(
                    "__tf_in"
                )
            )
        else:
            cond = F.lit(True)
            for n in pv_names:
                cond = cond & (bt(n) == F.lit(vals[n]))
            keys_df = (
                rel.df.filter(cond).select(bt(key.name).alias("__tf_in"))
                .distinct()
            )
        out_df, in_repr, out_repr = tf(db, keys_df, *resolved)
        for n in pv_names:
            out_df = out_df.withColumn(f"__tfp_{n}", F.lit(vals[n]))
        return out_df, in_repr, out_repr

    live_rows = [
        row
        for row in combo_rows
        # NULL never satisfies an equality predicate -> no bindings
        if not any(row[n] is None for n in pv_names)
    ]
    # Evaluate combos CONCURRENTLY (guide §2.6: actions are sequential
    # only because the driver calls them sequentially): each combo's
    # table-fn call runs eager setup jobs (ANN probe ranking, persists)
    # that are independent across combos, so a small driver pool lets
    # one combo's tail back-fill the cores another's barrier left idle
    # — measured 6.6s -> 3.5s on r159 (6 combos) at sf0.1. Results are
    # order-preserved (pool.map) and per-combo values are unaffected by
    # scheduling; the cap bounds the pool like the loop it replaces.
    # inheritable_thread_target propagates the caller's JVM-thread-local
    # properties (job group/description) into the pool threads, so jobs
    # submitted by combo workers still count toward the caller's group
    # (the bench's per-entry job metric counts by group).
    in_repr = out_repr = None
    outs = []
    if len(live_rows) > 1:
        from concurrent.futures import ThreadPoolExecutor

        from pyspark import inheritable_thread_target

        with ThreadPoolExecutor(
            max_workers=min(4, len(live_rows))
        ) as pool:
            results = list(
                pool.map(
                    inheritable_thread_target(db.store.spark)(_eval_combo),
                    live_rows,
                )
            )
    else:
        results = [_eval_combo(row) for row in live_rows]
    for out_df, in_repr, out_repr in results:
        outs.append(out_df)
    if not outs:
        # empty input relation (or all-NULL params): the result is empty;
        # no call was made, so the output repr is unconstrained — long
        # keeps the schema concrete for downstream projection (zero rows,
        # so no unification can observe the choice)
        if out.name in rel.vars:
            return Rel(rel.df.limit(0), dict(rel.vars))
        df = rel.df.limit(0).withColumn(
            out.name, F.lit(None).cast("bigint")
        )
        return Rel(df, {**rel.vars, out.name: "long"})
    union = outs[0]
    for o in outs[1:]:
        union = union.unionByName(o)
    if literal_key is not None:
        cond = F.lit(True)
        for n in pv_names:
            cond = cond & (bt(n) == F.col(f"__tfp_{n}"))
        joined = rel.df.join(
            F.broadcast(union.drop("__tf_in")), cond
        )
    else:
        jcond = unify_condition(
            bt(key.name), rel.vars[key.name], F.col("__tf_in"), in_repr
        )
        cond = jcond if jcond is not None else F.lit(False)
        for n in pv_names:
            cond = cond & (bt(n) == F.col(f"__tfp_{n}"))
        joined = rel.df.join(union, cond).drop("__tf_in")
    joined = joined.drop(*[f"__tfp_{n}" for n in pv_names])
    return _bind_tf_out(rel, joined, out, out_repr)


def _apply_clause(db: Db, rel: Optional[Rel], c, rules_env) -> Rel:
    if isinstance(c, PivotGroup):
        return join_rels(rel, compile_pivot_group(db, c))
    if isinstance(c, Pattern):
        return join_rels(rel, compile_pattern(db, c))
    if isinstance(c, RuleApp):
        if _is_axiom_app(c, rules_env) and rel is not None:
            return _axiom_filter(rel, c, rules_env)
        from unifydb_spark.query import rules as rules_mod

        return join_rels(rel, rules_mod.compile_rule_app(db, c, rules_env))
    if isinstance(c, Pred):
        if rel is None:
            raise QueryError("unbound-variable", "predicate before any pattern")
        args = [_arg(rel, a) for a in c.args]
        cond, _ = fnreg.apply_call(c.fn, args, kind="predicate")
        return Rel(rel.df.filter(cond), dict(rel.vars))
    if isinstance(c, FnBind):
        tf = (getattr(db.store, "table_fns", None) or {}).get(c.fn)
        if tf is not None:
            # a LITERAL-key table fn can start the relation (its key
            # needs no prior binding); _apply_table_fn handles rel=None
            return _apply_table_fn(db, rel, c, tf)
        if rel is None:
            raise QueryError("unbound-variable", "function binding before any pattern")
        args = [_arg(rel, a) for a in c.args]
        col, repr_ = fnreg.apply_call(c.fn, args, kind="function")
        out = c.out
        if isinstance(out, Var):
            if out.name in rel.vars:  # output already bound -> unify = filter
                cond = unify_condition(col, repr_, bt(out.name), rel.vars[out.name])
                cond = cond if cond is not None else F.lit(False)
                return Rel(rel.df.filter(cond), dict(rel.vars))
            df = rel.df.withColumn(out.name, col)
            return Rel(df, {**rel.vars, out.name: repr_})
        if isinstance(out, SeqPat):
            # destructuring output (reference apply-func unifies the result
            # with any binding pattern, query.clj:106-130): promote the
            # result to canonical JSON and run the sequence unifier
            jcol = to_json_repr(col, repr_)
            udf = make_seq_unify_udf(json.dumps(_serialize_seqpat(out)))
            df = rel.df.withColumn("__fbinds", udf(jcol)).filter(
                F.col("__fbinds").isNotNull()
            )
            vars_out = dict(rel.vars)
            for v in out.vars():
                if v.name in vars_out:  # already bound -> unify = filter
                    cond = unify_condition(
                        F.col("__fbinds")[v.name], "json", bt(v.name), vars_out[v.name]
                    )
                    df = df.filter(cond if cond is not None else F.lit(False))
                else:
                    df = df.withColumn(v.name, F.col("__fbinds")[v.name])
                    vars_out[v.name] = "json"
            return Rel(df.drop("__fbinds"), vars_out)
        raise QueryError(
            "invalid-clause", f"cannot bind function output to {out!r}"
        )
    if isinstance(c, Not):
        # negation-as-failure as an anti-join, seeded with the outer bindings
        # so predicates/axioms inside the negatee see their variables
        # (reference evaluates the negatee per frame, query.clj:58-68; the
        # seed also semi-join-prunes the negatee scan — a win at scale)
        shared = sorted(_clause_vars(c.clause) & set(rel.vars)) if rel else []
        seed = None
        if rel is not None and shared:
            seed = Rel(
                rel.df.select(*[bt(n) for n in shared]).distinct(),
                {n: rel.vars[n] for n in shared},
            )
        sub = compile_where(db, c.clause, rules_env, seed=seed)
        if rel is None:
            raise QueryError("unbound-variable", ":not before any pattern")
        return join_rels(rel, sub, how="left_anti")
    if isinstance(c, (And,)):
        out = rel
        for x in c.clauses:
            out = _apply_clause(db, out, x, rules_env)
        return out
    if isinstance(c, Or):
        sub = compile_where(db, And((c,)), rules_env)
        return join_rels(rel, sub)
    raise QueryError("invalid-clause", f"cannot compile clause {c!r}")


def _arg(rel: Rel, a):
    if isinstance(a, Var):
        if a.name not in rel.vars:
            raise QueryError(
                "unbound-variable",
                f"Unbound variable {a.name}",
                variable=a.name,
            )
        return (bt(a.name), rel.vars[a.name])
    return a


# ---------------------------------------------------------------------------
# disjunction via DNF expansion (Q3)

_MAX_BRANCHES = 64


def dnf_branches(clause) -> list[list]:
    if isinstance(clause, And):
        acc: list[list] = [[]]
        for c in clause.clauses:
            subs = dnf_branches(c)
            acc = [a + s for a in acc for s in subs]
            if len(acc) > _MAX_BRANCHES:
                raise QueryError(
                    "query-too-complex",
                    f"disjunction expansion exceeds {_MAX_BRANCHES} branches",
                )
        return acc
    if isinstance(clause, Or):
        out: list[list] = []
        for c in clause.clauses:
            out.extend(dnf_branches(c))
        return out
    return [[clause]]


def align_union(rels: list) -> Rel:
    """UNION ALL of relations with schema alignment: disjuncts may bind
    different vars (reference disjoin query.clj:35-43 — bag semantics,
    missing vars -> null) and the same var may carry different reprs
    (promoted to a common repr)."""
    if len(rels) == 1:
        return rels[0]
    target: dict[str, str] = {}
    for r in rels:
        for n, rp in r.vars.items():
            target[n] = merge_repr(target[n], rp) if n in target else rp
    aligned = []
    for r in rels:
        cols = []
        for n, rp in target.items():
            if n in r.vars:
                cols.append(promote_col(bt(n), r.vars[n], rp).alias(n))
            else:
                cols.append(F.lit(None).cast(REPR_DDL[rp]).alias(n))
        aligned.append(r.df.select(*cols))
    df = aligned[0]
    for d in aligned[1:]:
        df = df.unionByName(d)
    return Rel(df, target)


def compile_where(db: Db, where: And, rules_env=None, seed: Optional[Rel] = None) -> Rel:
    branches = dnf_branches(where)
    return align_union([compile_conj(db, b, rules_env, seed=seed) for b in branches])

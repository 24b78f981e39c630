"""Rule application (SURVEY Q7): Datalog rules as views, with recursion via
semi-naive fixpoint iteration.

The reference unifies the query against each rule conclusion after gensym
α-renaming, then evaluates the rule body (apply-rules
src/unifydb/query.clj:238-274; bodiless rules are axioms, rules.clj:3-7).
It has no recursion guard — cyclic data would loop forever (noted TODO
query.clj:271). Here:

 - non-recursive rules expand inline as view subplans (one UNION branch per
   matching rule) so Catalyst optimizes through them;
 - recursive rule sets (detected per strongly-connected component of the
   rule call graph) run as a driver-side **semi-naive fixpoint**: only the
   last iteration's delta feeds the recursive branches, new tuples are
   anti-joined against the accumulated total, and `localCheckpoint()` cuts
   the growing plan lineage each round (SURVEY §4 custom-work item 1).
   An iteration cap guards non-termination on pathological rules.

Scale notes: the fixpoint's per-iteration work is distinct+anti-join on the
IDB key columns — both shuffle on the same keys, so AQE coalesces them; the
delta shrinks monotonically. Recursion through :not (unstratified negation)
is rejected at compile time.
"""

from __future__ import annotations

import itertools
from typing import Optional

from pyspark.sql import functions as F

from unifydb_spark.query import compile as C
from unifydb_spark.query.parse import (
    And,
    FnBind,
    Not,
    Or,
    Pattern,
    Pred,
    QueryError,
    Rule,
    RuleApp,
    SeqPat,
    Var,
    WILDCARD,
)

_FRESH = itertools.count()

MAX_ITERATIONS = 100


class RulesEnv:
    def __init__(self, rules: tuple, max_iterations: int = MAX_ITERATIONS):
        self.by_name: dict[str, list[Rule]] = {}
        for r in rules or ():
            self.by_name.setdefault(r.name, []).append(r)
        self.overlays: dict[str, C.Rel] = {}
        self.max_iterations = max_iterations
        self._recursive_names = self._find_recursive()

    def _called(self, clause) -> set:
        if isinstance(clause, RuleApp):
            return {clause.name}
        if isinstance(clause, (And, Or)):
            out: set = set()
            for c in clause.clauses:
                out |= self._called(c)
            return out
        if isinstance(clause, Not):
            return self._called(clause.clause)
        return set()

    def _find_recursive(self) -> set:
        # transitive closure of the rule call graph; a name is recursive if
        # it reaches itself
        edges = {
            n: set().union(*(self._called(r.body) for r in rs)) & set(self.by_name)
            for n, rs in self.by_name.items()
        }
        reach = {n: set(e) for n, e in edges.items()}
        changed = True
        while changed:
            changed = False
            for n in reach:
                ext = set().union(*(reach.get(m, set()) for m in reach[n]))
                if not ext <= reach[n]:
                    reach[n] |= ext
                    changed = True
        return {n for n in reach if n in reach[n]}

    def scc_of(self, name: str) -> set:
        # mutually-recursive group: names that reach each other
        edges = {
            n: set().union(*(self._called(r.body) for r in rs)) & set(self.by_name)
            for n, rs in self.by_name.items()
        }
        reach = {n: set(e) for n, e in edges.items()}
        changed = True
        while changed:
            changed = False
            for n in reach:
                ext = set().union(*(reach.get(m, set()) for m in reach[n]))
                if not ext <= reach[n]:
                    reach[n] |= ext
                    changed = True
        return {m for m in reach.get(name, set()) | {name}
                if name in reach.get(m, set()) and m in reach.get(name, set())}


def _rename_term(t, mapping):
    if isinstance(t, Var):
        if t.name not in mapping:
            mapping[t.name] = f"{t.name}__r{next(_FRESH)}"
        return Var(mapping[t.name])
    if isinstance(t, SeqPat):
        return SeqPat(
            tuple(_rename_term(i, mapping) for i in t.items),
            _rename_term(t.rest, mapping) if t.rest else None,
        )
    return t


def _rename_clause(c, mapping):
    """Gensym α-renaming (reference rename-vars, query.clj:238-258)."""
    if isinstance(c, Pattern):
        return Pattern(*(_rename_term(t, mapping) for _, t in c.positions))
    if isinstance(c, And):
        return And(tuple(_rename_clause(x, mapping) for x in c.clauses))
    if isinstance(c, Or):
        return Or(tuple(_rename_clause(x, mapping) for x in c.clauses))
    if isinstance(c, Not):
        return Not(_rename_clause(c.clause, mapping))
    if isinstance(c, Pred):
        return Pred(c.fn, tuple(_rename_term(a, mapping) for a in c.args))
    if isinstance(c, FnBind):
        return FnBind(
            c.fn,
            tuple(_rename_term(a, mapping) for a in c.args),
            _rename_term(c.out, mapping),
        )
    if isinstance(c, RuleApp):
        return RuleApp(c.name, tuple(_rename_term(a, mapping) for a in c.args))
    return c


def _const_repr(v) -> str:
    from unifydb_spark.values import Ref

    if isinstance(v, Ref):
        return "ref"
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "long"
    if isinstance(v, float):
        return "double"
    if isinstance(v, str):
        return "string"
    return "json"


def _adapt(rel: C.Rel, params: tuple, args: tuple) -> C.Rel:
    """Unify a rule-result relation (columns = head params) with the
    call-site argument terms (reference unify of query against rule
    conclusion, query.clj:260-274)."""
    df = rel.df
    out_vars: dict[str, str] = {}
    select = []
    conds = []
    seen_args: dict[str, tuple] = {}
    for param, arg in zip(params, args):
        if isinstance(param, Var):
            if param.name not in rel.vars:
                raise QueryError(
                    "unbound-variable",
                    f"rule head variable ?{param.name} is never bound in the body",
                )
            prepr = rel.vars[param.name]
            pcol = C.bt(param.name)
            if isinstance(arg, Var):
                if arg.name in seen_args:  # repeated call arg: (r ?x ?x)
                    c0, r0 = seen_args[arg.name]
                    cond = C.unify_condition(pcol, prepr, c0, r0)
                    conds.append(cond if cond is not None else F.lit(False))
                else:
                    seen_args[arg.name] = (pcol, prepr)
                    select.append(pcol.alias(arg.name))
                    out_vars[arg.name] = prepr
            elif arg is WILDCARD:
                pass
            else:
                cond = C.unify_condition(
                    pcol, prepr, F.lit(int(arg) if _const_repr(arg) == "ref" else arg),
                    _const_repr(arg),
                )
                conds.append(cond if cond is not None else F.lit(False))
        else:  # constant head param
            if isinstance(arg, Var):
                if arg.name not in seen_args:
                    r = _const_repr(param)
                    lit = F.lit(int(param) if r == "ref" else param)
                    seen_args[arg.name] = (lit, r)
                    select.append(lit.alias(arg.name))
                    out_vars[arg.name] = r
            elif arg is not WILDCARD and arg != param:
                conds.append(F.lit(False))
    for c in conds:
        df = df.filter(c)
    if not select:
        # fully-ground call: keep a 1-row-iff-derivable marker relation
        df = df.select(F.lit(1).alias(f"__t{next(_FRESH)}")).limit(1)
        return C.Rel(df, {})
    return C.Rel(df.select(*select), out_vars)


def _expand_rule(db, rule: Rule, env: "RulesEnv") -> tuple:
    """α-rename and compile one rule body; returns (renamed params, Rel)."""
    mapping: dict[str, str] = {}
    params = tuple(_rename_term(p, mapping) for p in rule.params)
    body = _rename_clause(rule.body, mapping)
    if not body.clauses:  # axiom (reference rules.clj:3-7, :always-true)
        raise QueryError(
            "invalid-rule",
            "axioms (bodiless rules) require ground call arguments",
        )
    rel = C.compile_where(db, body, env)
    return params, rel


def _axiom_rel(db, rule: Rule, app: RuleApp) -> Optional[C.Rel]:
    """Bodiless rule: succeeds iff call args unify with head params."""
    binds: dict[str, object] = {}
    for param, arg in zip(rule.params, app.args):
        if isinstance(param, Var):
            if param.name in binds:
                if binds[param.name] != arg:
                    return None
            else:
                binds[param.name] = arg
        else:
            if arg is not WILDCARD and not isinstance(arg, Var) and arg != param:
                return None
    # every distinct arg var must end up with a concrete value
    out = {}
    for param, arg in zip(rule.params, app.args):
        if isinstance(arg, Var):
            val = param if not isinstance(param, Var) else binds.get(param.name)
            if isinstance(val, (Var,)) or val is None or val is WILDCARD:
                raise QueryError(
                    "unbound-variable",
                    f"axiom call leaves ?{arg.name} unbound",
                )
            out[arg.name] = val
    df = db.store.spark.range(1)
    cols, vars_out = [], {}
    for name, val in out.items():
        r = _const_repr(val)
        cols.append(F.lit(int(val) if r == "ref" else val).alias(name))
        vars_out[name] = r
    return C.Rel(
        df.select(*cols) if cols else df.select(F.lit(1).alias(f"__t{next(_FRESH)}")),
        vars_out,
    )


def compile_rule_app(db, app: RuleApp, env: Optional["RulesEnv"]) -> C.Rel:
    if env is None or app.name not in env.by_name:
        if env is not None and app.name in env.overlays:
            ov = env.overlays[app.name]
            params = tuple(Var(n) for n in ov.vars)
            return _adapt(ov, params, app.args)
        raise QueryError("unknown-rule", f"Unknown rule {app.name}", rule=app.name)
    if app.name in env.overlays:
        ov = env.overlays[app.name]
        params = tuple(Var(n) for n in ov.vars)
        return _adapt(ov, params, app.args)
    if app.name in env._recursive_names:
        idb = _fixpoint(db, app.name, env)
        params = tuple(Var(n) for n in idb.vars)
        return _adapt(idb, params, app.args)
    rels = []
    for rule in env.by_name[app.name]:
        if not rule.body.clauses:
            ax = _axiom_rel(db, rule, app)
            if ax is not None:
                rels.append(ax)
            continue
        params, rel = _expand_rule(db, rule, env)
        rels.append(_adapt(rel, params, app.args))
    if not rels:
        raise QueryError("unknown-rule", f"no applicable rule {app.name}")
    return C.align_union(rels)


def _positional(db, rule: Rule, env: "RulesEnv") -> C.Rel:
    """Compile one rule branch into the IDB's positional schema
    (__p0..__pk)."""
    params, rel = _expand_rule(db, rule, env)
    args = tuple(Var(f"__p{i}") for i in range(len(params)))
    return _adapt(rel, params, args)


def _contains_scc_call(env: "RulesEnv", clause, scc: set, under_not=False) -> bool:
    if isinstance(clause, RuleApp):
        if clause.name in scc:
            if under_not:
                raise QueryError(
                    "unstratified-negation",
                    f"recursive rule {clause.name} used inside :not",
                )
            return True
        return False
    if isinstance(clause, (And, Or)):
        return any(_contains_scc_call(env, c, scc, under_not) for c in clause.clauses)
    if isinstance(clause, Not):
        return _contains_scc_call(env, clause.clause, scc, True)
    return False


def _fixpoint(db, name: str, env: "RulesEnv") -> C.Rel:
    """Semi-naive least-fixpoint evaluation of the SCC containing `name`."""
    scc = env.scc_of(name)
    base: dict[str, list] = {n: [] for n in scc}
    rec: dict[str, list] = {n: [] for n in scc}
    for n in scc:
        for rule in env.by_name[n]:
            if not rule.body.clauses:
                raise QueryError("invalid-rule", "axiom inside a recursive rule set")
            (rec if _contains_scc_call(env, rule.body, scc) else base)[n].append(rule)

    totals: dict[str, C.Rel] = {}
    deltas: dict[str, C.Rel] = {}
    for n in scc:
        if not base[n]:
            raise QueryError(
                "invalid-rule", f"recursive rule {n} has no non-recursive branch"
            )
        r = C.align_union([_positional(db, rule, env) for rule in base[n]])
        df = r.df.distinct().localCheckpoint(eager=True)
        totals[n] = C.Rel(df, dict(r.vars))
        deltas[n] = totals[n]

    from unifydb_spark import instrument

    for _round in range(env.max_iterations):
        instrument.note("rule_fixpoint_rounds", _round + 1)
        new_deltas: dict[str, C.Rel] = {}
        any_new = False
        for n in scc:
            if not rec[n]:
                continue
            # recursive branches see the previous delta for SCC calls
            env.overlays.update({m: deltas[m] for m in scc})
            try:
                produced = C.align_union(
                    [_positional(db, rule, env) for rule in rec[n]]
                )
            finally:
                for m in scc:
                    env.overlays.pop(m, None)
            tot = totals[n]
            fresh = C.join_rels(
                C.Rel(produced.df.distinct(), dict(produced.vars)), tot, "left_anti"
            )
            fresh_df = fresh.df.localCheckpoint(eager=True)
            cnt = fresh_df.count()
            if cnt > 0:
                any_new = True
                union = C.align_union(
                    [totals[n], C.Rel(fresh_df, dict(fresh.vars))]
                )
                # keep the total LAZY: both inputs are already checkpointed
                # (base at entry, each delta above), so the union is a scan
                # of materialized blocks — eagerly re-checkpointing it here
                # would rewrite the whole accumulated total every iteration
                # (quadratic materialization in the fixpoint size)
                totals[n] = C.Rel(union.df, dict(union.vars))
                new_deltas[n] = C.Rel(fresh_df, dict(fresh.vars))
            else:
                new_deltas[n] = C.Rel(
                    fresh_df.limit(0), dict(fresh.vars)
                )
        deltas = new_deltas if new_deltas else deltas
        if not any_new:
            return totals[name]
    raise QueryError(
        "fixpoint-divergence",
        f"rule {name} did not reach a fixpoint in {env.max_iterations} iterations",
    )

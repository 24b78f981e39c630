"""Pull (document projection, SURVEY R15) — implemented in a later phase.

Reference: src/unifydb/query/pull.clj (compiles each pull expression into
one batched subquery over all matched entity ids, then re-nests rows into
maps/lists using attribute cardinality).
"""

from __future__ import annotations

from unifydb_spark.query.parse import QueryError


def attach_pulls(db, rel, parsed):
    raise QueryError("not-implemented", "pull expressions land in phase 5")

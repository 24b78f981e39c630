"""Lightweight run-metrics registry for data-dependent iteration counts.

The iterative operators (histogram-narrowing quantilers, graph/rule
fixpoints) have documented round bounds — O(log_buckets n) narrowing
rounds, O(diameter) supersteps, monotone peels — but the rounds actually
used are data-dependent, so scale claims need MEASUREMENT, not just the
bound (VERDICT r7 ask #1). Operators call `note(key, value)` at the end
of each run (a dict write — no Spark action, no overhead on the hot
path); harnesses read/reset `counters` around a run
(scripts/scale_stress.py).

Values are per-process and last-write-wins per key: this is a probe for
single-operator harness runs, not a concurrent metrics system.
"""

from __future__ import annotations

counters: dict[str, float] = {}


def note(key: str, value: float) -> None:
    counters[key] = value


def bump(key: str, by: float = 1.0) -> None:
    counters[key] = counters.get(key, 0.0) + by


def reset() -> None:
    counters.clear()

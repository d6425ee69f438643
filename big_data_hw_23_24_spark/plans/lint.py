"""Plan linter: flag the physical-plan shapes that quietly kill a
100 TB job.

The engine's test suite pins these properties per operator
(tests/test_plans.py); this module exposes the same detectors as a
product API so a USER query can be vetted before it runs on a
cluster — ``lint(df)`` returns structured findings instead of
assertions:

* ``partitionless_window`` — a Window over ``Exchange
  SinglePartition``: every row of that branch through ONE reducer.
  The single worst scale smell; fine only on provably bounded inputs
  (a vocabulary, a LIMITed top-k).
* ``cartesian`` — ``CartesianProduct`` or a non-trivial
  ``BroadcastNestedLoopJoin``: O(|L|·|R|) pairing. A 1-row
  IdentityBroadcast probe (scalar subquery, bloom bitmap) is the
  accepted exception and is NOT flagged.
* ``python_row_udf`` — ``BatchEvalPython``: row-at-a-time Python in
  the plan; 10-100× slower than the Arrow-batched forms
  (``ArrowEvalPython`` / ``FlatMapGroupsInPandas`` pass the lint —
  they are the engine's sanctioned extension points).
* ``unpushed_scan`` — a parquet scan with a Filter directly above it
  but an empty ``PushedFilters``: the predicate is evaluated after
  the read instead of skipping row groups. (Heuristic: expression
  predicates like HOF lambdas are legitimately unpushable; the
  finding says "look", not "wrong".)

Findings carry (rule, node excerpt) so callers can allowlist known
cases the way the test suite allowlists the vocab-scale windows.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

from .inspect import explain_str


@dataclass
class Finding:
    rule: str
    detail: str


def _partitionless_windows(lines: list[str]) -> list[Finding]:
    out = []
    for i, ln in enumerate(lines):
        if re.search(r"\bWindow \[", ln):
            for nxt in lines[i + 1:i + 4]:
                if "Exchange SinglePartition" in nxt:
                    out.append(Finding("partitionless_window",
                                       ln.strip()[:160]))
                    break
    return out


def _cartesians(lines: list[str]) -> list[Finding]:
    # every CartesianProduct / BroadcastNestedLoopJoin is reported —
    # the plan text cannot distinguish a bounded 1-row
    # IdentityBroadcast probe (scalar subquery, bloom bitmap) from a
    # genuine pairing, so callers allowlist the bounded cases exactly
    # as the engine's own plan tests do
    return [Finding("cartesian", ln.strip()[:160]) for ln in lines
            if "CartesianProduct" in ln
            or "BroadcastNestedLoopJoin" in ln]


def _python_row_udfs(lines: list[str]) -> list[Finding]:
    return [Finding("python_row_udf", ln.strip()[:160])
            for ln in lines if "BatchEvalPython" in ln]


def _unpushed_scans(text: str) -> list[Finding]:
    out = []
    # formatted-mode sections pair Filter nodes with their child scans;
    # cheap heuristic on simple mode: a FileScan with empty
    # PushedFilters while the plan contains any Filter at all
    scans = re.findall(r"FileScan parquet [^\n]*PushedFilters: \[\]", text)
    if scans and "Filter " in text:
        for s in scans:
            out.append(Finding("unpushed_scan", s.strip()[:160]))
    return out


def lint(df: DataFrame,
         rules: tuple[str, ...] = ("partitionless_window", "cartesian",
                                   "python_row_udf")) -> list[Finding]:
    """Lint ``df``'s physical plan; returns findings for the enabled
    ``rules`` (``unpushed_scan`` is opt-in — expression predicates are
    legitimately unpushable, so it reports hints, not defects)."""
    text = explain_str(df, "simple")
    lines = text.splitlines()
    found: list[Finding] = []
    if "partitionless_window" in rules:
        found += _partitionless_windows(lines)
    if "cartesian" in rules:
        found += _cartesians(lines)
    if "python_row_udf" in rules:
        found += _python_row_udfs(lines)
    if "unpushed_scan" in rules:
        found += _unpushed_scans(text)
    return found

"""Data profiling and contract validation (the Deequ/expectations
pattern): the audit layer that runs BEFORE a 100 TB table is trusted.

Both operators are single-pass by construction — every metric folds
into one hash-aggregate job regardless of how many columns or checks
ride it — because at scale the dominant cost of an audit is the table
scan, and an audit that scans once per check is unusable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_report", "validate_contracts"]


def profile_report(df: DataFrame, columns: list[str] | None = None
                   ) -> DataFrame:
    """Column profile (E164) → one row per column:
    ``(column, n_rows, n_null, n_distinct, min_value, max_value)``.

    The schema-discovery / drift-baseline artifact: null and
    cardinality counts plus value bounds for every profiled column,
    min/max rendered as strings so heterogeneous column types share
    one report schema (numeric columns keep their natural ordering —
    the string cast happens AFTER the typed min/max).

    ONE aggregate pass computes every metric (count + per-column
    count(col), count(distinct col), min, max in a single
    hash-aggregate — Catalyst plans multi-distinct via expand, still
    one scan); the per-column rows come from exploding a literal
    struct array of the already-aggregated values — #columns rows,
    driver-free.
    """
    cols = columns or df.columns
    aggs = [F.count("*").alias("_n")]
    for c in cols:
        aggs += [F.count(c).alias(f"_nn_{c}"),
                 F.countDistinct(c).alias(f"_nd_{c}"),
                 F.min(c).cast("string").alias(f"_mn_{c}"),
                 F.max(c).cast("string").alias(f"_mx_{c}")]
    one = df.agg(*aggs)
    rows = F.array(*[
        F.struct(F.lit(c).alias("column"),
                 F.col("_n").alias("n_rows"),
                 (F.col("_n") - F.col(f"_nn_{c}")).alias("n_null"),
                 F.col(f"_nd_{c}").alias("n_distinct"),
                 F.col(f"_mn_{c}").alias("min_value"),
                 F.col(f"_mx_{c}").alias("max_value"))
        for c in cols])
    return (one.select(F.explode(rows).alias("_r"))
            .select("_r.column",
                    F.col("_r.n_rows").cast("long").alias("n_rows"),
                    F.col("_r.n_null").cast("long").alias("n_null"),
                    F.col("_r.n_distinct").cast("long").alias("n_distinct"),
                    "_r.min_value", "_r.max_value"))


def validate_contracts(df: DataFrame, checks: dict[str, Column]
                       ) -> DataFrame:
    """Data-contract validation (E165) → one row per check:
    ``(check_name, n_violations, passed)``.

    ``checks`` maps a check name to its VIOLATION predicate (true =
    this row breaks the contract); the report counts violations per
    check in ONE conditional-sum aggregate pass and flags
    ``passed = (n_violations == 0)``. Cross-table contracts
    (referential integrity) are anti-join counts — compose them in
    and union the rows; see the registry face.
    """
    # coalesce: sum over ZERO rows is NULL — an empty-but-valid table
    # must read as 0 violations / passed, not unverdicted
    aggs = [F.coalesce(F.sum(F.when(pred, 1).otherwise(0)), F.lit(0))
            .cast("long")
            .alias(f"_v_{i}") for i, pred in enumerate(checks.values())]
    one = df.agg(*aggs)
    rows = F.array(*[
        F.struct(F.lit(name).alias("check_name"),
                 F.col(f"_v_{i}").alias("n_violations"))
        for i, name in enumerate(checks)])
    return (one.select(F.explode(rows).alias("_r"))
            .select("_r.check_name",
                    F.col("_r.n_violations").cast("long")
                    .alias("n_violations"),
                    (F.col("_r.n_violations") == 0).alias("passed")))


def fk_orphan_audit(edges: list[tuple[DataFrame, str, str,
                                      DataFrame, str, str]]
                    ) -> DataFrame:
    """Referential-integrity audit across foreign-key edges (E204) →
    one row per edge: ``(child_table, fk_col, parent_table,
    n_child_rows, n_orphans, orphan_share, passed)``.

    The cross-TABLE sibling of the per-table contract battery
    (validate_contracts): a star schema's correctness lives in its
    edges, and a broken upstream export shows up as child rows whose
    FK matches no parent — invisible to every single-table check and
    silently DROPPED by the inner joins downstream queries use (the
    damage is missing revenue, not an error). NULL FKs count as
    orphans: a key that can't join is an orphan for the audit's
    purpose, whatever the schema says about nullability.

    Shape per edge: distinct parent keys (a key-only aggregate), one
    LEFT equi-join, one count aggregate — linear, no windows; the
    report is a union of single-row frames. Each edge is an
    independent job; at cluster scale edges run concurrently.
    """
    reports = []
    for child, fk, child_name, parent, pk, parent_name in edges:
        pkeys = parent.select(F.col(pk).alias("_pk")).distinct()
        joined = child.select(F.col(fk).alias("_fk")).join(
            pkeys, F.col("_fk") == F.col("_pk"), "left")
        rep = joined.agg(
            F.count("*").cast("long").alias("n_child_rows"),
            F.sum(F.col("_pk").isNull().cast("long")).cast("long")
            .alias("n_orphans"))
        reports.append(rep.select(
            F.lit(child_name).alias("child_table"),
            F.lit(fk).alias("fk_col"),
            F.lit(parent_name).alias("parent_table"),
            "n_child_rows", "n_orphans",
            F.round(F.col("n_orphans") / F.col("n_child_rows"), 6)
            .alias("orphan_share"),
            (F.col("n_orphans") == 0).alias("passed")))
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out

"""Declarative validation rule engine — one aggregation pass per table.

Port of the reference's validator semantics
(``/root/reference/src/data_validator.py:22-126``: required/null checks,
unique-column duplicate counts, positive/non-negative ranges, business
rules) onto DataFrames. The reference walks pandas columns in Python; here
every rule compiles to a conditional aggregate in ONE ``select`` — a single
scan, map-side combined, no shuffle (global agg), which is what survives
100 TB. Duplicate checks need a groupBy, so they run as ONE additional
keyed pass covering every unique column at once (rows explode to
(column, value) pairs; a single partial-agg'd groupBy counts them all) —
the pass count stays 2 regardless of how many unique rules exist.

Rule set shape::

    rules = {
        "required_columns": ["a", "b"],
        "null_thresholds": {"a": 0.05},          # max null fraction
        "unique": ["a"],                          # duplicate count == 0
        "positive": ["qty"],                      # > 0
        "non_negative": ["price"],                # >= 0
        "checks": [(name, Column<bool>), ...],    # business rules, True=bad
    }

``validate`` returns ``{is_valid, issues, warnings, metrics}`` like the
reference's dict contract.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, functions as F


def _bad(cond: Column) -> Column:
    """Count of rows violating (cond is the VIOLATION predicate)."""
    return F.sum(F.when(cond, 1).otherwise(0)).cast("long")


def compile_aggregates(df: DataFrame, rules: dict[str, Any]) -> list[Column]:
    """Compile the rule set to one list of aggregate expressions."""
    aggs: list[Column] = [F.count(F.lit(1)).cast("long").alias("_n_rows")]
    for c in rules.get("null_thresholds", {}):
        aggs.append(_bad(F.col(c).isNull()).alias(f"_nulls_{c}"))
    for c in rules.get("positive", []):
        aggs.append(_bad(F.col(c) <= 0).alias(f"_nonpos_{c}"))
    for c in rules.get("non_negative", []):
        aggs.append(_bad(F.col(c) < 0).alias(f"_neg_{c}"))
    for name, cond in rules.get("checks", []):
        aggs.append(_bad(cond).alias(f"_check_{name}"))
    return aggs


def validate(df: DataFrame, rules: dict[str, Any]) -> dict[str, Any]:
    """Run the rule set; single scan + optional keyed pass for uniques."""
    issues: list[str] = []
    warnings: list[str] = []

    missing = [c for c in rules.get("required_columns", []) if c not in df.columns]
    issues += [f"missing required column: {c}" for c in missing]

    row = df.select(compile_aggregates(df, rules)).collect()[0].asDict()
    n = row["_n_rows"]
    metrics: dict[str, Any] = {"n_rows": n}

    for c, thresh in rules.get("null_thresholds", {}).items():
        frac = (row[f"_nulls_{c}"] / n) if n else 0.0
        metrics[f"null_fraction_{c}"] = frac
        if frac > thresh:
            issues.append(f"{c}: null fraction {frac:.4f} > {thresh}")
    for c in rules.get("positive", []):
        k = row[f"_nonpos_{c}"]
        metrics[f"non_positive_{c}"] = k
        if k:
            issues.append(f"{c}: {k} non-positive values")
    for c in rules.get("non_negative", []):
        k = row[f"_neg_{c}"]
        metrics[f"negative_{c}"] = k
        if k:
            issues.append(f"{c}: {k} negative values")
    for name, _ in rules.get("checks", []):
        k = row[f"_check_{name}"]
        metrics[f"violations_{name}"] = k
        if k:
            issues.append(f"business rule '{name}': {k} violations")

    uniq = [c for c in rules.get("unique", []) if c in df.columns]
    if uniq:
        # ONE keyed pass for ALL unique columns: explode each row to
        # (col_name, value-as-string) pairs, count per pair, sum the excess
        # per column. String casts keep NULL and are collision-safe because
        # grouping is per column name.
        pairs = df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("_col"),
                            F.col(c).cast("string").alias("_val"),
                        )
                        for c in uniq
                    ]
                )
            ).alias("p")
        ).select("p._col", "p._val")
        per_col = {
            r["_col"]: r["d"]
            for r in (
                pairs.groupBy("_col", "_val")
                .count()
                .filter(F.col("count") > 1)
                .groupBy("_col")
                .agg(F.sum(F.col("count") - 1).alias("d"))
                .collect()
            )
        }
        for c in uniq:
            dups = int(per_col.get(c, 0))
            metrics[f"duplicates_{c}"] = dups
            if dups:
                warnings.append(f"{c}: {dups} duplicate values")

    return {
        "is_valid": not issues,
        "issues": issues,
        "warnings": warnings,
        "metrics": metrics,
    }


#: Engine rule set for the CDC transcripts table (FIXTURES.md §1) — the
#: analog of the reference's per-table VALIDATION_RULES dict
#: (``/root/reference/src/data_validator.py:22-60``).
def transcript_rules() -> dict[str, Any]:
    return {
        "required_columns": ["conv_id", "turn_idx", "role", "text", "ts"],
        "null_thresholds": {"conv_id": 0.0, "turn_idx": 0.0, "role": 0.02},
        "non_negative": ["turn_idx"],
        "checks": [
            (
                "role_domain",
                ~F.col("role").isin("user", "assistant", "system", "tool")
                & F.col("role").isNotNull(),
            ),
            ("empty_text", (F.col("text") == "") & F.col("text").isNotNull()),
        ],
    }

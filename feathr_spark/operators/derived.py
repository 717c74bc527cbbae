"""Derived features: row-level SQL expressions over already-joined
feature columns, resolved in dependency order.

Reference: feathr_project/feathr/definition/feature_derivations.py:11-49
and offline/derived/DerivedFeatureEvaluator.scala — the reference
supports MVEL/SQL/UDF derivations; SQL expressions cover the semantics
(SURVEY.md §2.7), and Python callables returning a Column cover the UDF
strategy (offline/derived/strategies/SparkUdfDerivation.scala).
"""

from __future__ import annotations

from typing import Callable, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from feathr_spark.definitions import DerivedFeature


def apply_derived_features(
    df: DataFrame,
    derived: Sequence[Union[DerivedFeature, tuple]],
) -> DataFrame:
    """Apply derivations in order; each sees previously derived columns.

    Items are ``DerivedFeature`` or ``(name, sql_expr)`` tuples or
    ``(name, callable(DataFrame) -> Column)``.
    """
    out = df
    for d in derived:
        if isinstance(d, DerivedFeature):
            name, expr = d.name, d.expr
        else:
            name, expr = d
        col = expr(out) if callable(expr) else F.expr(expr)
        if not isinstance(col, Column):
            raise TypeError(f"derivation {name} did not produce a Column")
        out = out.withColumn(name, col)
    return out


def apply_derived_in_order(df: DataFrame,
                           derived: Sequence[DerivedFeature]) -> DataFrame:
    """Apply derivations in dependency order: a derivation whose declared
    ``inputs`` include a not-yet-derived name waits for it (the
    reference's DerivedFeatureEvaluator resolves the same DAG). Raises on
    cycles / unresolvable inputs."""
    out = df
    remaining = list(derived)
    applied: set = set()
    while remaining:
        progress = False
        for d in list(remaining):
            deps = set(d.inputs) if d.inputs else set()
            if deps - set(out.columns) - applied:
                continue
            out = apply_derived_features(out, [(d.name, d.expr)])
            applied.add(d.name)
            remaining.remove(d)
            progress = True
        if not progress:
            raise ValueError(f"circular/unresolvable derived features: "
                             f"{[d.name for d in remaining]}")
    return out

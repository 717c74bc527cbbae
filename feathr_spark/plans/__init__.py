"""Logical planning: feature classification, stage grouping, the
top-level join_features entry point."""

from feathr_spark.plans.planner import FeatureGroups, join_features  # noqa: F401

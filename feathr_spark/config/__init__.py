"""HOCON config compatibility layer (reference config dialect)."""

from feathr_spark.config.hocon import HoconParseError, loads
from feathr_spark.config.loader import (
    FeatureDefModel,
    FeatureRequest,
    GenConfigModel,
    JoinConfigModel,
    gen_spec_from_feature_def,
    load_feature_def,
    load_gen_config,
    load_join_config,
    parse_duration,
    run_join_config,
)

__all__ = [
    "HoconParseError",
    "loads",
    "FeatureDefModel",
    "FeatureRequest",
    "GenConfigModel",
    "JoinConfigModel",
    "gen_spec_from_feature_def",
    "load_feature_def",
    "load_gen_config",
    "load_join_config",
    "parse_duration",
    "run_join_config",
]

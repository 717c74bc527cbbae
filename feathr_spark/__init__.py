"""feathr_spark — a from-scratch PySpark-native feature-engineering engine
with the query semantics of xiaoyongzhu/feathr (point-in-time as-of joins,
sliding-window aggregations, derived/lookup features, materialization),
plus the training-data-pipeline operators a 100 TB corpus needs
(dedup, similarity search, text analysis, multimodal plumbing).

Ships as a plain ``--py-files``-able package: no native deps beyond
pyspark/pyarrow/pandas/numpy.
"""

from feathr_spark.definitions import (  # noqa: F401
    Anchor,
    DerivedFeature,
    Feature,
    LookupFeature,
    ObservationSettings,
    Source,
    SWAFeature,
    WindowSpec,
    register_aggregation,
)
from feathr_spark.client import (  # noqa: F401
    FeathrClient,
    FeatureQuery,
    MaterializationSettings,
)
from feathr_spark.operators.asof import asof_fetch, asof_join  # noqa: F401
from feathr_spark.operators.swa import join_window_agg_features  # noqa: F401
from feathr_spark.session import get_spark, release_caches  # noqa: F401
from feathr_spark.functions.fds import to_fds  # noqa: F401

__version__ = "0.1.0"

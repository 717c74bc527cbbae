from feathr_spark.functions.mvel import (  # noqa: F401
    MvelAnchorExtractor,
    MvelTranslationError,
    mvel_column,
    mvel_feature,
    mvel_to_sql,
)
from feathr_spark.functions.timestamps import to_epoch_micros  # noqa: F401
from feathr_spark.functions.fds import to_fds, infer_feature_type  # noqa: F401

from feathr_spark.functions.timestamps import to_epoch_micros  # noqa: F401

from cdc_core_spark.functions import transforms  # noqa: F401

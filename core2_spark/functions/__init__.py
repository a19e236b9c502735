from core2_spark.functions import periods, text, vectors  # noqa: F401

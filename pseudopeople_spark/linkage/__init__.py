from pseudopeople_spark.linkage.pipeline import resolve  # noqa: F401

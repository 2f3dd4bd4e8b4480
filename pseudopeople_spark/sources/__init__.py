from pseudopeople_spark.sources.reader import load_standard_dataset  # noqa: F401

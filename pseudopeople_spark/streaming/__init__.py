from pseudopeople_spark.streaming.stream_noise import noise_stream  # noqa: F401

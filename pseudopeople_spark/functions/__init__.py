from pseudopeople_spark.functions.similarity import (  # noqa: F401
    double_metaphone_udf,
    jaro_winkler,
    jaro_winkler_udf,
    ngrams,
    token_set_ratio_udf,
)

"""pseudopeople_spark — a from-scratch PySpark-native engine with the
query/data-processing capabilities of ihmeuw/pseudopeople, plus the
entity-resolution (record-linkage) pipeline the reference exists to
benchmark.

Design stance (see SURVEY.md §7):
  * DataFrame API + built-in pyspark.sql.functions everywhere; Arrow
    pandas UDFs only where no built-in exists (Jaro-Winkler, token
    corruption kernels).
  * Deterministic common-random-numbers: every stochastic decision is
    ``hash_u01(seed, decision_key, record_id)`` — invariant to
    partitioning, shard count and executor count.
  * Zero RDDs, zero per-row Python UDFs, zero driver-side row loops.
"""

__version__ = "0.1.0"

from pseudopeople_spark.session import get_spark  # noqa: F401

from pseudopeople_spark.plans.inspect import (  # noqa: F401
    assert_broadcast_join,
    assert_pushed_filters,
    count_python_eval_nodes,
    physical_plan,
)

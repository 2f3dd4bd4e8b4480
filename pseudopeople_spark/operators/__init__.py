from pseudopeople_spark.operators.column_noise import (  # noqa: F401
    choose_wrong_option,
    copy_from_household_member,
    leave_blank,
    misreport_age,
    swap_month_and_day,
    use_fake_name,
    use_nickname,
    write_wrong_digits,
    write_wrong_zipcode_digits,
)
from pseudopeople_spark.operators.kernels import make_corrupt_tokens_udf  # noqa: F401
from pseudopeople_spark.operators.row_noise import (  # noqa: F401
    do_not_respond,
    duplicate_with_guardian,
    omit_rows,
)

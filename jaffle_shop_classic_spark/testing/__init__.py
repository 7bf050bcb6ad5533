from .checks import (
    CheckResult,
    accepted_range,
    accepted_values,
    expression_is_true,
    not_null,
    relationships,
    row_count_between,
    run_checks,
    unique,
    unique_combination,
)

__all__ = [
    "CheckResult",
    "accepted_range",
    "accepted_values",
    "expression_is_true",
    "not_null",
    "relationships",
    "row_count_between",
    "run_checks",
    "unique",
    "unique_combination",
]

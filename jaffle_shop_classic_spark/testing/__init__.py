from .checks import (
    CheckResult,
    accepted_values,
    not_null,
    relationships,
    run_checks,
    unique,
)

__all__ = [
    "CheckResult",
    "accepted_values",
    "not_null",
    "relationships",
    "run_checks",
    "unique",
]

from .jaffle import (
    PAYMENT_METHODS,
    build_project,
    build_snapshots,
    jaffle_checks,
    load_jaffle_sources,
)

__all__ = [
    "PAYMENT_METHODS",
    "build_project",
    "build_snapshots",
    "jaffle_checks",
    "load_jaffle_sources",
]

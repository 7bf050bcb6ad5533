from .jaffle import PAYMENT_METHODS, build_project, jaffle_checks

__all__ = ["PAYMENT_METHODS", "build_project", "jaffle_checks"]

from .catalog import CATALOG, QuerySpec, register

__all__ = ["CATALOG", "QuerySpec", "register"]

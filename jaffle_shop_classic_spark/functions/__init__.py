from .vector import cosine_parts, dot_sql, l2_norm_sql

__all__ = ["cosine_parts", "dot_sql", "l2_norm_sql"]

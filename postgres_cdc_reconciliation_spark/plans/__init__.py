from .registry import QuerySpec, all_queries, register  # noqa: F401

from .queries import QUERY_REGISTRY, QuerySpec  # noqa: F401

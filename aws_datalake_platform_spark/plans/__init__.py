from .queries import QUERY_REGISTRY, QuerySpec  # noqa: F401
from . import llm_ops  # noqa: F401,E402  (populates QUERY_REGISTRY)
from . import temporal  # noqa: F401,E402  (populates QUERY_REGISTRY)
from . import extras  # noqa: F401,E402  (populates QUERY_REGISTRY)
from . import sql_surface  # noqa: F401,E402  (populates QUERY_REGISTRY)
from . import curation  # noqa: F401,E402  (populates QUERY_REGISTRY)
from . import profiling  # noqa: F401,E402  (populates QUERY_REGISTRY)
from . import advanced  # noqa: F401,E402  (populates QUERY_REGISTRY)
from . import advanced2  # noqa: F401,E402  (populates QUERY_REGISTRY)

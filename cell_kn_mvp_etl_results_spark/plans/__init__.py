from .registry import REGISTRY, QuerySpec, all_oracle_sql, all_queries

# Importing the plan modules registers their queries.
from . import relational  # noqa: F401,E402
from . import graph_queries  # noqa: F401,E402
from . import llmdata  # noqa: F401,E402
from . import extended  # noqa: F401,E402
from . import extended2  # noqa: F401,E402
from . import traversals  # noqa: F401,E402
from . import subgraph  # noqa: F401,E402
from . import pointintime  # noqa: F401,E402
from . import clusters  # noqa: F401,E402
from . import analytics  # noqa: F401,E402
from . import selection  # noqa: F401,E402
from . import featureprep  # noqa: F401,E402

__all__ = ["REGISTRY", "QuerySpec", "all_queries", "all_oracle_sql"]

"""Named end-to-end queries — the SURVEY.md §2 operator inventory,
each expressed as an idiomatic Spark DataFrame plan plus (where
SQL-expressible) an equivalent DuckDB oracle query.

Importing this package populates the registry.
"""

from .registry import REGISTRY, QuerySpec, register  # noqa: F401

# Import all plan modules so their @register decorators run.
from . import relational  # noqa: F401,E402
from . import windows  # noqa: F401,E402
from . import joins_setops  # noqa: F401,E402
from . import events  # noqa: F401,E402
from . import text  # noqa: F401,E402
from . import dedup  # noqa: F401,E402
from . import similarity  # noqa: F401,E402
from . import upserts  # noqa: F401,E402
from . import streaming_queries  # noqa: F401,E402
from . import semistructured  # noqa: F401,E402
from . import pipeline  # noqa: F401,E402
from . import cluster  # noqa: F401,E402
from . import corpus  # noqa: F401,E402
from . import marts  # noqa: F401,E402
from . import semantic  # noqa: F401,E402
from . import fulltext  # noqa: F401,E402
from . import io_formats  # noqa: F401,E402
from . import dataquality  # noqa: F401,E402

__all__ = ["REGISTRY", "QuerySpec", "register"]

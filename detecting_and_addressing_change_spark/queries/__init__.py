"""Declared query surface (SURVEY §2.8) + LLM-pipeline extensions.

Importing this package populates the registry; ``__spark_entry__.py`` exposes
it to the driver.
"""

from .registry import QUERIES, ORACLE_SQL, query  # noqa: F401
from . import relational  # noqa: F401,E402
from . import relational2  # noqa: F401,E402
from . import relational3  # noqa: F401,E402
from . import arrays_ml  # noqa: F401,E402
from . import extensions  # noqa: F401,E402
from . import extensions2  # noqa: F401,E402
from . import extensions3  # noqa: F401,E402
from . import extensions4  # noqa: F401,E402
from . import extensions5  # noqa: F401,E402
from . import drift  # noqa: F401,E402

__all__ = ["QUERIES", "ORACLE_SQL", "query"]

"""Query plans: the engine's public query surface.

``registry`` maps query names (SURVEY.md §2 operator IDs) to
(Spark callable, DuckDB oracle SQL) pairs consumed by
``__spark_entry__.py`` and the test harness.
"""

from wiki_data_pipeline_spark.plans.registry import (  # noqa: F401
    QuerySpec,
    all_oracles,
    all_queries,
    get,
    query,
)

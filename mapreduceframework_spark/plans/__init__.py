from mapreduceframework_spark.plans.registry import (  # noqa: F401
    REGISTRY,
    QuerySpec,
    all_queries,
    query,
)

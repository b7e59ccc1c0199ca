from mapreduceframework_spark.sources.registry import (  # noqa: F401
    TABLES,
    load_table,
    register_views,
    table_schema,
)

from mapreduceframework_spark.core.client import (  # noqa: F401
    CharCountClient,
    FilterEvensClient,
    MapReduceClient,
    ModuloHistogramClient,
)
from mapreduceframework_spark.core.job import (  # noqa: F401
    Job,
    JobState,
    Stage,
    run_job,
    start_map_reduce_job,
)

from flink_wsr_project_spark.plans.registry import (  # noqa: F401
    all_queries,
    all_oracles,
    register,
)

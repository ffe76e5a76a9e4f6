from flink_wsr_project_spark.sources.readers import (  # noqa: F401
    load_table,
    load_tables,
    parse_csv_lines,
    parse_apache_log_lines,
)

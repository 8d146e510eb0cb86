from parquetaivectorsearch_spark.sources.catalog import (
    TABLES,
    approx_num_rows,
    load_table,
    load_tables,
)
from parquetaivectorsearch_spark.sources.parquet import (
    scan_csv,
    scan_json,
    scan_parquet_dir,
    schema_table,
    write_json_sample,
)

__all__ = [
    "TABLES",
    "approx_num_rows",
    "load_table",
    "load_tables",
    "scan_csv",
    "scan_json",
    "scan_parquet_dir",
    "schema_table",
    "write_json_sample",
]

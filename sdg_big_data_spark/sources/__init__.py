from .readers import load_tables, read_csv, read_json, read_orc, read_parquet
from .writers import write_parquet, write_partitioned, write_single_csv

__all__ = [
    "load_tables",
    "read_csv",
    "read_json",
    "read_orc",
    "read_parquet",
    "write_parquet",
    "write_partitioned",
    "write_single_csv",
]

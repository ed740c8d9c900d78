from .readers import TESTDATA_TABLES, load_table, read_carprice_csv, read_csv, read_parquet
from .writers import write_csv_single, write_parquet

__all__ = [
    "TESTDATA_TABLES",
    "load_table",
    "read_carprice_csv",
    "read_csv",
    "read_parquet",
    "write_csv_single",
    "write_parquet",
]

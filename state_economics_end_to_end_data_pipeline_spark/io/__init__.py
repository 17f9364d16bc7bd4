from .readers import read_csv, read_excel_sheet, read_parquet_table
from .writers import write_csv, write_jdbc, write_parquet

__all__ = [
    "read_csv",
    "read_excel_sheet",
    "read_parquet_table",
    "write_csv",
    "write_jdbc",
    "write_parquet",
]

from .io import (
    export_excel,
    load_model,
    read_csv,
    read_jsonl,
    read_stopwords,
    read_xlsx,
    save_model,
    write_csv,
    write_jsonl,
    write_parquet,
    write_xlsx,
)
from .tables import TABLE_NAMES, load_table, load_tables, parallelized, register_views
from .xlsx_source import XlsxDataSource

__all__ = [
    "TABLE_NAMES",
    "XlsxDataSource",
    "export_excel",
    "load_model",
    "load_table",
    "load_tables",
    "parallelized",
    "read_csv",
    "read_jsonl",
    "read_stopwords",
    "read_xlsx",
    "register_views",
    "save_model",
    "write_csv",
    "write_jsonl",
    "write_parquet",
    "write_xlsx",
]

from .io import (
    fetch_pandas,
    fetch_rows,
    load_table,
    normalize_timestamps_ingest,
    read_csv,
    read_parquet,
    write_csv,
    write_parquet,
)

__all__ = [
    "fetch_pandas",
    "fetch_rows",
    "load_table",
    "normalize_timestamps_ingest",
    "read_csv",
    "read_parquet",
    "write_csv",
    "write_parquet",
]

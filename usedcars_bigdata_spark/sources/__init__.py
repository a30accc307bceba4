from .io import load_table, read_csv, read_parquet, write_csv, write_parquet

__all__ = ["load_table", "read_csv", "read_parquet", "write_csv", "write_parquet"]

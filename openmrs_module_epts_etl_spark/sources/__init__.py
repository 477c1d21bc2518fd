from .files import csv_export, json_export, json_load_stream, sql_dump_export

__all__ = ["json_export", "json_load_stream", "csv_export", "sql_dump_export"]

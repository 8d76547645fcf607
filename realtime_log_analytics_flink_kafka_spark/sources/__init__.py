from .batch import load_table, load_tables, register_views  # noqa: F401
from .files import read_csv, read_jsonl, write_csv, write_jsonl  # noqa: F401

from gcp_map_reduce_spark.sources.tables import TABLE_NAMES, load_table, register_all
from gcp_map_reduce_spark.sources.text import read_text_corpus

__all__ = ["TABLE_NAMES", "load_table", "register_all", "read_text_corpus"]

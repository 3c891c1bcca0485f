from bistro_spark.sources.io import load_table, register_views
from bistro_spark.sources.tokens import token_table

__all__ = ["load_table", "register_views", "token_table"]

from lucille_spark.analysis.analyzers import (
    duckdb_tokens_sql,
    tokenize_col,
    tokenize_py,
)

__all__ = ["tokenize_col", "tokenize_py", "duckdb_tokens_sql"]

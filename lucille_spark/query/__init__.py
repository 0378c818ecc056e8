from lucille_spark.query.parser import parse, QueryParseError
from lucille_spark.query.oracle import OracleIndex

__all__ = ["parse", "QueryParseError", "OracleIndex"]

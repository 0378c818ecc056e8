from lucille_spark.sinks.csv_sink import write_csv
from lucille_spark.sinks.index_sink import IndexSink

__all__ = ["write_csv", "IndexSink"]

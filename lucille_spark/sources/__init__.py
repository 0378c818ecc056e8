from lucille_spark.sources.files import FileSource
from lucille_spark.sources.csv_source import read_csv_docs
from lucille_spark.sources.jsonl_source import read_jsonl_docs
from lucille_spark.sources.sequence import sequence_docs

__all__ = ["FileSource", "read_csv_docs", "read_jsonl_docs", "sequence_docs"]

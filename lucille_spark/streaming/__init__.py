from lucille_spark.streaming.ingest import StreamingIndexer, StreamingIngest

__all__ = ["StreamingIngest", "StreamingIndexer"]

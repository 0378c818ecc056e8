from lucille_spark.streaming.ingest import StreamingIndexer, StreamingIngest
from lucille_spark.streaming.windows import (running_totals, session_windows,
                                             windowed_counts)

__all__ = ["StreamingIngest", "StreamingIndexer", "windowed_counts",
           "session_windows", "running_totals"]

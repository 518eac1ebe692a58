from .ingest import (
    stream_pages_to_triples,
    stream_windowed_mention_counts,
    stream_sessionize,
)

__all__ = [
    "stream_pages_to_triples",
    "stream_windowed_mention_counts",
    "stream_sessionize",
]

from .ingest import (
    stream_pages_to_triples,
    stream_pages_to_graph,
    stream_windowed_mention_counts,
    stream_sessionize,
)

__all__ = [
    "stream_pages_to_triples",
    "stream_pages_to_graph",
    "stream_windowed_mention_counts",
    "stream_sessionize",
]

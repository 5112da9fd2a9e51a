from .ingest import StreamIngest, stream_insert

__all__ = ["StreamIngest", "stream_insert"]

from .incremental import incremental_new_keys
from .windows import sessionized_stream, windowed_counts

__all__ = ["incremental_new_keys", "sessionized_stream", "windowed_counts"]

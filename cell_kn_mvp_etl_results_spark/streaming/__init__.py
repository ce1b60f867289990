from .incremental import incremental_new_keys
from .stateful import (
    debounced_stream,
    filled_daily_stream,
    quota_admitted_stream,
    running_user_totals,
)
from .windows import (
    deduplicated_stream,
    media_features_stream,
    sessionized_stream,
    windowed_counts,
)

__all__ = [
    "debounced_stream",
    "filled_daily_stream",
    "deduplicated_stream",
    "incremental_new_keys",
    "quota_admitted_stream",
    "running_user_totals",
    "sessionized_stream",
    "windowed_counts",
]

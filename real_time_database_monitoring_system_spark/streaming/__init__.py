from .rollup import stream_alerts, stream_rollup, stream_rollup_watermarked
from .stateful import stream_user_tracker

__all__ = [
    "stream_alerts",
    "stream_rollup",
    "stream_rollup_watermarked",
    "stream_user_tracker",
]

from .rollup import stream_alerts, stream_rollup

__all__ = ["stream_alerts", "stream_rollup"]

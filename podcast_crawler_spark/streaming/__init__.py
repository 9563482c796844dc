from .crawl_stream import (  # noqa: F401
    politeness_rate_limiter,
    streaming_dedup,
    streaming_sessions,
    run_crawl_stream,
    stage_metrics_stream,
    windowed_event_counts,
)

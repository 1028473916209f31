from crawl4ai_spark.streaming.stream import (  # noqa: F401
    results_stream,
    windowed_event_counts,
    run_windowed_events_batch_equivalent,
)

"""Structured Streaming layer (SURVEY §2.9 T1–T10).

Replaces the reference's Kafka topics + Flink SQL jobs
(`pipelines/scrapers/main.py:82-96`, `resources/flink.py:199-298`,
`flink/conf/flink-conf.yml`) with Structured Streaming: one source
abstraction (kafka | file | rate | memory), watermarked tumbling-window
aggregation, and an idempotent `foreachBatch` upsert sink giving the
exactly-once end-to-end contract (checkpoint + keyed last-wins dedup).

Documented semantic delta vs the reference (SURVEY §7.4.4): Flink's
early/late firing (`flink-conf.yml:92-95`) becomes Spark update-mode
emission per microbatch trigger; rows older than the watermark are dropped
rather than late-fired.
"""

from .sources import stream_source  # noqa: F401
from .windows import tumbling_window_counts, with_event_time  # noqa: F401
from .sinks import foreach_batch_upsert, start_to_memory  # noqa: F401
from .incremental import apply_rollup_batch, incremental_rollup, incremental_upsert  # noqa: F401

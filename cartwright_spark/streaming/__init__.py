"""Streaming surface.

The reference is batch-only (SURVEY.md §2.9): no streams, watermarks, or
state anywhere in jataware/cartwright. The north rule asks for *checkpointed
batch resumability*, which `sources.iceberg_lite` + `plans.pipeline`
provide (snapshot manifests, stage-key resume, per-partition lineage).

This package adds the one streaming-shaped capability a growing pages table
needs: **incremental micro-batch processing** — process only rows appended
since the last committed snapshot, exactly-once by construction (each
increment is keyed by the source snapshot id it consumed).
"""

from cartwright_spark.streaming.incremental import incremental_stage  # noqa: F401

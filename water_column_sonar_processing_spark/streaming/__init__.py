"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §2.9): orchestration is SNS/SQS
events + a checkpointed state machine, with no watermarks or event-time
windows. The engine therefore ships batch pipelines with lineage-based
resume as the v0 equivalent; a file-source `readStream` trigger between
levels (the SNS/SQS analog) is the natural extension point and can reuse
every operator in this package unchanged (they are all DataFrame ->
DataFrame transforms).
"""

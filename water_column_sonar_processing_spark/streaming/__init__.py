"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §2.9): orchestration is SNS/SQS
events + a checkpointed state machine, with no watermarks or event-time
windows. This engine ships:

- `ingest.py`: file-source readStream through the stateless L1 chain
  (extract + QC + cell encode) with exactly-once checkpointing — the
  SNS/SQS "new object landed" trigger analog;
- `stateful.py`: gap-based sessionization via applyInPandasWithState
  (per-key GroupState + processing-time timeout) with a deterministic
  batch twin for parity — the PipelineStatus per-key state machine
  restated as a custom stateful streaming operator;
- `tiles.py`: incremental L2 tile-pyramid maintenance (bounded-state
  stateful agg + zero-state per-batch partials with batch compaction);
- `dedup.py`: cross-batch first-occurrence dedup (GroupState per
  digest, TTL-bounded) with exact batch-twin parity;
- `decontam.py`: stateless stream-static decontamination (broadcast
  eval-gram join; per-doc decomposability makes the streaming form
  exactly the batch operator per micro-batch);
- `pip.py`: the flagship two-phase PIP join run continuously on the
  ingest stream (static cover/edge broadcasts; stateless refine;
  drained output row-equal to batch pip_join).

Track-sequential operators (distance-jump windows, Kalman) remain in the
batch consolidation level, exactly where the reference runs them.
"""

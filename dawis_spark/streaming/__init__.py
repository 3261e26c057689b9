"""Streaming-analog semantics (SURVEY §2.9) + Structured Streaming wrapper.

  alerts    — append-only alert queue consumed by high-watermark offset
  retry     — failed-import retry table (read at start, delete on success)
  processed — processed-log watermark for incremental operations (P7)
  stream    — availableNow micro-batch wrapper over staging directories
"""

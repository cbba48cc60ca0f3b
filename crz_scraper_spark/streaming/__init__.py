"""Structured Streaming surface (SURVEY.md §2.8): file-source streams,
watermarked tumbling/session windows, streaming dedup."""

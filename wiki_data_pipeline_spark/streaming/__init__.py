"""Incremental semantics (SURVEY.md §2.9): Structured Streaming jobs,
checkpoint/resume, dead-letter routing, adaptive rate limiting, and
custom stateful operators."""

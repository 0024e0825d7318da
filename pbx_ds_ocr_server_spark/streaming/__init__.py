"""Structured Streaming front-end (optional tier — SURVEY.md §2 notes the
reference has no event-time semantics; this wraps the same batch logic)."""

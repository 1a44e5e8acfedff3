"""Structured Streaming operators (SURVEY §2.10 stretch)."""

"""Structured Streaming surface (SURVEY §2.3 I)."""

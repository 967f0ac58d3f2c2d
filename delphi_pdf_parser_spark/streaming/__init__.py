"""Structured Streaming drop-ins."""

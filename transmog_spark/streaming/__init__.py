"""Streaming drivers: bounded-memory batch flush (reference P2) + Structured Streaming."""

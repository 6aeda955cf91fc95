"""Structured Streaming layer: event replay + conformance (SURVEY §2.8)."""

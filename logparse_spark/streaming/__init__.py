"""Streaming mode: the identical parse engine under Structured Streaming."""

"""Structured Streaming surface — placeholder, filled after batch parity."""

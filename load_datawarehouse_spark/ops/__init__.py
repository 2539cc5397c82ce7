"""Operator library: relational, window, LLM-pipeline, streaming."""

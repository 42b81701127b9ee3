"""Structured Streaming surface (SURVEY §2.12: engine extension — the
reference is batch-only with a polling status lifecycle)."""

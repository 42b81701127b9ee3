"""Composite operators (SURVEY §2.4 engine surface + LLM-pipeline ops)."""

"""Scalar function library (SURVEY.md §2.7)."""

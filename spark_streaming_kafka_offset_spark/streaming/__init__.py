"""Structured Streaming operators + offset ledger (SURVEY.md §2.9)."""

"""Batch relational operators (SURVEY.md §2.2–2.7)."""

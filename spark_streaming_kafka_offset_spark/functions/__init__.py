"""Scalar-function surface and LLM-pipeline text/similarity ops
(SURVEY.md §2.8, §2.10, §2.11)."""

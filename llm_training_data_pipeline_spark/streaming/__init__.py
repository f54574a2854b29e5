"""Structured Streaming variants (SURVEY.md §2.3 D6, step 9)."""

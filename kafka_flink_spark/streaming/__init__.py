"""Structured Streaming pipelines (SURVEY.md §2.9 W1-W14, §2.5 A1-A5
streaming forms, §2.2 K6 dual emit)."""

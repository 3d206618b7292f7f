"""Engine operators (SURVEY.md §2 inventory + LLM-data extensions)."""

"""Pipeline assembly (SURVEY.md §3)."""

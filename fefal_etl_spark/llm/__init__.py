"""LLM-data-pipeline operators (SURVEY.md §2.12). Queries in llm/queries.py."""

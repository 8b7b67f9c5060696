"""Relational + pipeline operators (SURVEY.md §2)."""

"""Relational + analytics operators (SURVEY.md §2) as DataFrame transforms."""

"""Relational operators, one module per SURVEY.md §2.3 category."""

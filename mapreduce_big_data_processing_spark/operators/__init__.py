"""Operator library: each module covers a SURVEY.md §2 operator family."""

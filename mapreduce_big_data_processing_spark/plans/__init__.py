"""Pipeline composition and iteration harnesses (SURVEY.md §3)."""

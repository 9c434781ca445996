"""HTTP serving surface (SURVEY.md §2.1 S8)."""

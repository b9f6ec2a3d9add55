"""SURVEY.md §2.8 extension operators — filled in milestone M4."""

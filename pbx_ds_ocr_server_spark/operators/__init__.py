"""DataFrame-in/DataFrame-out operators (SURVEY.md §2 mapping)."""

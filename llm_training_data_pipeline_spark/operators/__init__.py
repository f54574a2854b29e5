"""DataFrame -> DataFrame transform operators (SURVEY.md §2 inventory)."""

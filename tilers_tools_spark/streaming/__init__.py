"""streaming subpackage — see SURVEY.md §2."""

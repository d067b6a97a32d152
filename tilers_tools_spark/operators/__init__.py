"""operators subpackage — see SURVEY.md §2."""

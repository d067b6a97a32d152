"""functions subpackage — see SURVEY.md §2."""

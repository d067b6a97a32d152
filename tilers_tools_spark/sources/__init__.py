"""sources subpackage — see SURVEY.md §2."""

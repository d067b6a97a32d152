"""plans subpackage — see SURVEY.md §2."""

"""SPARQL-algebra-equivalent DataFrame operators (SURVEY.md §2.4-2.7)."""

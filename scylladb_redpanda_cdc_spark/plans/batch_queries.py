"""Placeholder — populated in a later stage (SURVEY.md §7)."""

SPECS: list = []

"""Placeholder — operators land incrementally (SURVEY.md §7.1)."""

"""Structured Streaming jobs: the NRT fire-feed surface (SURVEY.md §2.9)."""

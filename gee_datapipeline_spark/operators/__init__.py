"""Relational operator library.

Each module re-expresses one family from the reference's surface
(SURVEY.md §2) as composable DataFrame transformations. All functions are
lazy — they take and return DataFrames/Columns and never trigger actions.
"""

"""Reusable relational + extended operators (SURVEY.md §2.2-2.3, §2.10).

Each operator is a pure ``DataFrame -> DataFrame`` function so it can be
composed into pipelines, registered in the query library, and unit
tested on literal frames.
"""

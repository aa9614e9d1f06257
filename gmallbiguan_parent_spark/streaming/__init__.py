"""Structured Streaming variants of the warehouse pipelines
(SURVEY.md §2.8 ST1-ST7)."""

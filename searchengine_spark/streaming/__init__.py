"""Structured Streaming front-ends for the engine (SURVEY.md §2.8)."""

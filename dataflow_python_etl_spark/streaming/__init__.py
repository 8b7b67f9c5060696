"""Structured Streaming pipelines (SURVEY.md §2.3: the reference has
no streaming constructs; these are the Spark-native counterpart)."""

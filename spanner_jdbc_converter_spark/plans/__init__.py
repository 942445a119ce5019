"""Query corpus: every operator from SURVEY.md §2 as a (PySpark fn, oracle SQL) pair."""

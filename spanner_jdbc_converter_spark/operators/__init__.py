"""Large-scale pipeline operators: dedup, similarity search, text
analysis, multimodal columns (SURVEY.md §2.11)."""

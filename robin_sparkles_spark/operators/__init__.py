"""Operator surface — SURVEY.md §2 inventory plus the EXT
LLM-data-pipeline operators (dedup, similarity, text analysis,
multimodal)."""

"""Composable DataFrame operators covering the reference's inventory (SURVEY.md §2)
plus the LLM-data-pipeline extensions (dedup, similarity, text, multimodal)."""

"""LLM training-data pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) — the scale-oriented extension surface
defined by the build brief; the reference tool has none of these."""

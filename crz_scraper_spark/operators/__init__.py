"""Composed operators: reference-pipeline semantics (filter chain, tagging,
profiling) and scale extensions (dedup, similarity, multimodal)."""

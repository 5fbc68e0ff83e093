"""Operators: relational, nested/array, dedup, similarity, text, multimodal."""

"""Composite operators: similarity search, dedup, top-k, multimodal."""

"""Deduplication queries (filled in with dedup operators)."""

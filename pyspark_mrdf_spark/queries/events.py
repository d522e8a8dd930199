"""Event-stream queries (filled in with windowed/JSON operators)."""

"""Vector similarity queries (filled in with knn/ANN operators)."""

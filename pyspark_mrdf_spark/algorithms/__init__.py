"""Composite algorithms: MRDF approximate k-NN graph, NN-Descent,
recall evaluation."""

"""Distributed operators: spatial join, kNN, tiling, dedup, similarity."""

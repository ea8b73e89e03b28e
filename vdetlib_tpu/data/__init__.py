"""Data layer — frame IO, fused preprocessing, synthetic video generation."""

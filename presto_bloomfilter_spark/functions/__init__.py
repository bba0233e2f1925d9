"""Sketch cores: pure numpy, vectorized, mergeable."""

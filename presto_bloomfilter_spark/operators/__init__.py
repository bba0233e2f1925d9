"""Spark dataflow operators: sketch aggregation, probes, dedup,
similarity, text analysis, multimodal plumbing."""

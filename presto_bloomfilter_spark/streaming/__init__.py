"""Structured Streaming surface for incremental sketch maintenance."""

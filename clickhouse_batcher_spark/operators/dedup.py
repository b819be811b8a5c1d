"""Placeholder — filled in by the LLM-pipeline operator milestone."""

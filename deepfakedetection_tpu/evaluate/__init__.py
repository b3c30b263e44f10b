"""Batch evaluation: threshold sweep, metrics, plots, metrics.jsonl."""

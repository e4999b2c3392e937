"""Reference-compatible CLI entry points (train / enhance / calc_metrics)."""

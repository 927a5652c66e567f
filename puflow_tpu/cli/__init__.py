"""Command-line entry points (train / upsample / evaluate)."""

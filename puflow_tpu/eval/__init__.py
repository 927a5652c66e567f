"""Evaluation metrics and the `evaluation.csv` driver."""

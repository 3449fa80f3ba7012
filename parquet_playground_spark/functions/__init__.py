"""Scalar-function surface + LLM-data-pipeline operators."""

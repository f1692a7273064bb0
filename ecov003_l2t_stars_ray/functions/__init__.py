"""Vectorized per-batch functions: bucketing, partial rollup, Kalman, text."""

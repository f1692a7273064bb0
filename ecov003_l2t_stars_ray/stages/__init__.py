"""Stages: the wide / stateful steps of the rollup pipeline."""

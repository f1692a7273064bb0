"""End-to-end Ray Data pipelines: rollup tiers, dedup, similarity, analytics."""

"""State: lineage manifest (resume) + smoother checkpoint chain (epochs)."""

"""Sources: synthetic transcript generator + Parquet readers/manifest."""

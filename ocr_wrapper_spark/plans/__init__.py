"""End-to-end job plans: extraction pipeline, partitioning/skew helpers."""

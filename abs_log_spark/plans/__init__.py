"""Plans: end-to-end pipeline composition, checkpoint/resume, lineage metrics."""

"""Plans: composed end-to-end pipelines and the driver-facing query registry."""

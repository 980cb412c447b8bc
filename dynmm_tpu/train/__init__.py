"""Training loops, objectives, metrics and schedules."""

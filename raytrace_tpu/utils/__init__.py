"""IO, progress, video, profiling, checkpoint helpers."""

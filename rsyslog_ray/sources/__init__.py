from .transcripts import read_scaled, read_transcripts  # noqa: F401

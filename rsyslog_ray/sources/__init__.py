from .transcripts import read_transcripts  # noqa: F401

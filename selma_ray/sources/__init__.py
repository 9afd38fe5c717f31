"""Sources: transcript synthesis + parquet readers."""

from .transcripts import (
    synthesize_transcripts,
    transcript_dataset,
    transcripts_parquet,
)

__all__ = [
    "synthesize_transcripts",
    "transcript_dataset",
    "transcripts_parquet",
]

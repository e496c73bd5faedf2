from .transcripts import (  # noqa: F401
    ensure_corpus,
    synth_queries,
    synth_transcripts,
    transcripts_path,
    queries_path,
)

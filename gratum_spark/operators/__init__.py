"""Beyond-reference operators: dedup, similarity search, text analysis,
multimodal plumbing, windowed analytics. See each module's docstring for
the 100 TB scale design."""

from . import dedup, http, joins, multimodal, pgp, sampling, similarity, text

__all__ = ["dedup", "similarity", "text", "multimodal", "pgp", "http", "joins", "sampling"]

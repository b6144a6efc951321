from .scalar import (
    cosine_similarity,
    normalize_text,
    tokens,
    word_ngrams,
)

__all__ = ["cosine_similarity", "normalize_text", "tokens", "word_ngrams"]

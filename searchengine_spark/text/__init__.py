from .tokenizer import tokenize, tokenize_with_positions
from .porter import porter_stem
from .stopwords import STOPWORDS, is_stopword
from .analyze import analyze, analyze_counts

__all__ = [
    "tokenize",
    "tokenize_with_positions",
    "porter_stem",
    "STOPWORDS",
    "is_stopword",
    "analyze",
    "analyze_counts",
]

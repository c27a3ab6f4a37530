"""Stopword set (analogue of reference lib/stopwords.py:6-22).

174-word list shipped verbatim from the reference's rsrc/stopwords.txt.
"""

from importlib.resources import files

# importlib.resources (not a filesystem Path) so the list resolves when
# the package ships as a spark-submit --py-files zip
_TEXT = files("searchengine_spark.rsrc").joinpath("stopwords.txt").read_text()

STOPWORDS = frozenset(w.strip() for w in _TEXT.splitlines() if w.strip())


def is_stopword(word):
    return word in STOPWORDS

from .synth import synth_corpus, QUERIES

__all__ = ["synth_corpus", "QUERIES"]

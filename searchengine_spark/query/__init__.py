from .prune import analyze_query, prune_query_terms

__all__ = ["analyze_query", "prune_query_terms"]

from .pagerank import pagerank_df
from .hits import hits_df

__all__ = ["pagerank_df", "hits_df"]

"""Mini query language shared by every tier ([NORTH-EXT]).

One parser feeds three consumers so the syntax cannot fork:
the Spark operator (ops/search.query_topk), its DuckDB oracle builder
(ops/search.query_topk_oracle_sql), and the Spark-free serving tier
(query/serve_local.LocalSearcher.search).  Lives under text/ because it
is pure string processing with no Spark dependency — the serving tier
imports it without touching pyspark.

Syntax:
  bare tokens        -> must (conjunctive, scored)
  "quoted tokens"    -> phrase (adjacent positions required; its tokens
                        also score like must terms)
  -token             -> must_not (boolean NOT, eligibility-only)
  lang:value         -> metadata filter (the only field understood)
"""

from __future__ import annotations

import re

from .tokenizer import tokenize


def parse_query(q: str) -> dict:
    """Parse ``q`` into {"must", "must_not", "phrases", "filters",
    "scoring"}; ``scoring`` is the sorted distinct union of must +
    phrase tokens (the terms BM25 sums over).  Raises on unknown
    ``field:`` prefixes rather than guessing."""
    phrases = [tokenize(p) for p in re.findall(r'"([^"]*)"', q)]
    phrases = [p for p in phrases if p]
    rest = re.sub(r'"[^"]*"', " ", q)
    must, must_not, filters = [], [], {}
    for tok in rest.split():
        if tok.startswith("-"):
            must_not.extend(tokenize(tok[1:]))
        elif ":" in tok:
            field, value = tok.split(":", 1)
            if field != "lang":
                raise ValueError(f"unknown query field: {field!r}")
            filters["lang"] = value
        else:
            must.extend(tokenize(tok))
    scoring = sorted(set(must) | {t for p in phrases for t in p})
    return {
        "must": must,
        "must_not": sorted(set(must_not)),
        "phrases": phrases,
        "filters": filters,
        "scoring": scoring,
    }

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
  tok* / *tok        -> wildcard clause (prefix / suffix): the doc must
                        contain at least one dictionary term matching
                        the pattern.  ELIGIBILITY-ONLY and uncapped —
                        Lucene's constant-score MultiTermQuery rewrite:
                        wildcard expansions never contribute BM25, so
                        survivor scores equal the plain conjunctive
                        scores exactly (the filtered-search invariant).
                        The base matches STORED surface forms and is
                        not analyzed (a wildcard has no stem).  Infix
                        and multi-star patterns raise.
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
    must, must_not, filters, wildcards = [], [], {}, []
    for tok in rest.split():
        if "*" in tok:
            if tok.startswith("-") or ":" in tok:
                raise ValueError(f"wildcards unsupported in {tok!r}")
            if tok.count("*") != 1 or len(tok) < 2:
                raise ValueError(f"bad wildcard: {tok!r}")
            if tok.endswith("*"):
                kind, base = "prefix", tok[:-1]
            elif tok.startswith("*"):
                kind, base = "suffix", tok[1:]
            else:
                raise ValueError(f"bad wildcard (infix): {tok!r}")
            bt = tokenize(base)
            if len(bt) != 1:
                raise ValueError(
                    f"wildcard base must be one token: {tok!r}"
                )
            wildcards.append((kind, bt[0]))
        elif tok.startswith("-"):
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
        "wildcards": sorted(set(wildcards)),
        "scoring": scoring,
    }

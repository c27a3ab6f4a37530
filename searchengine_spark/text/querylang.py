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
  lang:value         -> metadata filter (lang / source are the
  source:value          understood fields — the documents table's
                        metadata columns)
  a|b|c              -> OR group (one scoring SLOT): the doc must match
                        at least one alternative, and its score sums
                        BM25 over ALL matched alternatives — Lucene's
                        SynonymQuery-inside-BooleanQuery shape (the
                        synonym_topk semantics, inline in the query).
                        Alternatives are single tokens; a term may
                        appear in only ONE scoring slot (two groups, or
                        a group and a bare/phrase token, would double-
                        count its BM25 — ambiguous, so it raises).
  -a|b               -> negated OR group: pure De Morgan — the doc must
                        contain NEITHER alternative (== -a -b);
                        eligibility-only like any -term.  '-' anywhere
                        but the front of the group raises, and a
                        negated group cannot carry boosts.
  a^2|b              -> boosted alternative inside an OR group: slot
                        eligibility is weight-blind, but a matched
                        boosted term's BM25 contribution scales by its
                        weight (the ^ rule applied per-alternative);
                        the same term repeated in the group with a
                        different weight raises.  OR still cannot
                        combine with :/* operators.
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
  token^2.5          -> boosted must term (Lucene's `^` boost): scored
                        and conjunctive like a bare token, but its BM25
                        contribution is multiplied by the boost.
                        Eligibility is UNCHANGED (a boost never admits
                        or drops a doc — it reweights survivors), so
                        every non-boost clause composes as before.
                        Boost applies to bare terms only: combining ^
                        with -/:/*/| raises, as does boosting a term
                        that also appears unboosted, in a phrase, or
                        with a different boost value (which weight
                        would win is ambiguous).  The value must be a
                        positive finite float.
"""

from __future__ import annotations

import math
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
    must, must_not, filters, wildcards, groups = [], [], {}, [], []
    boosts: dict[str, float] = {}
    plain: list[str] = []  # bare must terms (boost-ambiguity check)
    def _parse_boost(tok: str, num: str) -> float:
        try:
            wt = float(num)
        except ValueError:
            raise ValueError(f"bad boost value: {tok!r}") from None
        if not (wt > 0 and math.isfinite(wt)):
            raise ValueError(
                f"boost must be a positive finite number: {tok!r}"
            )
        return wt

    def _record_boost(term: str, wt: float, tok: str) -> None:
        if term in boosts and boosts[term] != wt:
            raise ValueError(f"conflicting boosts for {term!r}")
        boosts[term] = wt

    for tok in rest.split():
        if "|" in tok:
            if "*" in tok or ":" in tok:
                raise ValueError(
                    f"OR group cannot combine with :/*: {tok!r}"
                )
            # -a|b negates the WHOLE group (pure De Morgan: NOT(a OR b)
            # == must_not a AND must_not b — eligibility-only, like any
            # -term); a '-' anywhere else would silently vanish in the
            # tokenizer, so it raises.  a^2|b boosts ONE alternative:
            # the slot's eligibility is weight-blind, the boosted
            # term's BM25 contribution scales when matched (the slot
            # scorer's per-term wt column / the serving tier's idf
            # scaling).  A negated group cannot carry boosts (nothing
            # to score).
            neg = tok.startswith("-")
            body = tok[1:] if neg else tok
            if "-" in body:
                raise ValueError(
                    f"'-' must prefix the whole OR group: {tok!r}"
                )
            if neg and "^" in body:
                raise ValueError(
                    f"negated OR group cannot carry boosts: {tok!r}"
                )
            alts: list[str] = []
            seen_wt: dict[str, float | None] = {}
            for part in body.split("|"):
                base, caret, num = part.partition("^")
                wt = _parse_boost(tok, num) if caret else None
                bt = tokenize(base)
                if len(bt) != 1:
                    raise ValueError(
                        f"OR alternative must be one token: {tok!r}"
                    )
                t = bt[0]
                if t in seen_wt and seen_wt[t] != wt:
                    raise ValueError(
                        f"conflicting weights inside OR group: {tok!r}"
                    )
                seen_wt[t] = wt
                if wt is not None and not neg:
                    _record_boost(t, wt, tok)
                alts.append(t)
            g = tuple(sorted(set(alts)))
            if neg:
                must_not.extend(g)
            elif len(g) == 1:
                must.extend(g)  # degenerate group == bare token
                plain.extend(g)
            else:
                groups.append(g)
        elif "^" in tok:
            if "*" in tok or tok.startswith("-") or ":" in tok:
                raise ValueError(
                    f"boost applies to bare terms only: {tok!r}"
                )
            base, _, num = tok.partition("^")
            if not base or "^" in num:
                raise ValueError(f"bad boost: {tok!r}")
            wt = _parse_boost(tok, num)
            bt = tokenize(base)
            if len(bt) != 1:
                raise ValueError(
                    f"boost base must be one token: {tok!r}"
                )
            _record_boost(bt[0], wt, tok)
            must.append(bt[0])
        elif "*" in tok:
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
            if field not in ("lang", "source"):
                raise ValueError(f"unknown query field: {field!r}")
            filters[field] = value
        else:
            bt = tokenize(tok)
            must.extend(bt)
            plain.extend(bt)
    or_groups = sorted(set(groups))
    if set(boosts) & (set(plain) | {t for p in phrases for t in p}):
        raise ValueError(
            "a boosted term may not also appear unboosted or in a "
            "phrase (which weight wins is ambiguous)"
        )
    base_terms = set(must) | {t for p in phrases for t in p}
    gterms = [t for g in or_groups for t in g]
    if len(gterms) != len(set(gterms)) or set(gterms) & base_terms:
        raise ValueError(
            "a term may appear in only one scoring slot "
            "(OR group vs OR group / bare / phrase)"
        )
    slots = sorted([(t,) for t in base_terms] + or_groups)
    return {
        "must": must,
        "must_not": sorted(set(must_not)),
        "phrases": phrases,
        "filters": filters,
        "wildcards": sorted(set(wildcards)),
        "or_groups": or_groups,
        "slots": slots,
        "boosts": boosts,
        "scoring": sorted(base_terms | set(gterms)),
    }

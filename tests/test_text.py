"""Unit tests for the text layer (SURVEY.md §5.1 golden vectors)."""

from searchengine_spark.text import (
    analyze,
    analyze_counts,
    is_stopword,
    porter_stem,
    tokenize,
    tokenize_with_positions,
)
from searchengine_spark.text.simhash import (
    bands,
    crc64,
    hamming32,
    is_similar,
    simhash32,
)
from searchengine_spark.text.tokenizer import ngrams

PORTER_VECTORS = {
    # classic published vectors from the 1980 paper's examples
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall", "hissing": "hiss",
    "failing": "fail", "filing": "file", "happy": "happi", "sky": "sky",
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "digitizer": "digit", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good", "revival": "reviv", "allowance": "allow",
    "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
    "adoption": "adopt", "communism": "commun", "activate": "activ",
    "homologou": "homolog", "effective": "effect", "bowdlerize": "bowdler",
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll", "generalization": "gener",
    "oscillator": "oscil",
}


def test_porter_vectors():
    for word, expect in PORTER_VECTORS.items():
        assert porter_stem(word) == expect, word


def test_tokenizer_code_literal():
    # reference fixture TEST.txt:301-316
    assert tokenize('print("Hello world!")') == ["print", "hello", "world"]


def test_tokenizer_positions():
    assert tokenize_with_positions("a b a") == [("a", 1), ("b", 2), ("a", 3)]


def test_tokenizer_empty_and_punct():
    assert tokenize("") == []
    assert tokenize("!!! ??? ...") == []


def test_ngrams():
    assert ngrams(["a", "b", "c"], 2) == ["a b", "b c"]
    assert ngrams(["a"], 2) == []
    assert ngrams(["a", "b"], 1) == []


def test_analyze_counts_positions():
    c = analyze_counts("run running runs", stem=True)
    assert c == {"run": (3, [1, 2, 3])}
    c2 = analyze_counts("tree binary tree", stem=True)
    assert c2["tree"] == (2, [1, 3])
    assert c2["binari"] == (1, [2])


def test_stopwords():
    assert is_stopword("the")
    assert is_stopword("aren't")
    assert not is_stopword("spark")


def test_crc64_check_value():
    # public CRC-64/XZ check value
    assert crc64(b"123456789") == 0x995DC9BBDF1939FA


def test_simhash_known_answer():
    fp = simhash32({"hello": 3, "world": 2, "foo": 1})
    assert fp == simhash32({"hello": 3, "world": 2, "foo": 1})
    assert 0 <= fp < 2**32
    assert hamming32(fp, fp) == 0
    assert is_similar(fp, fp ^ 0b111)  # 3 differing bits
    assert not is_similar(fp, fp ^ 0b1111)  # 4 differing bits


def test_simhash_bands_cover_hamming3():
    fp = simhash32({"alpha": 5, "beta": 2})
    near = fp ^ 0b10100000000000000000000000000001  # 3 bits spread out
    b1 = dict(bands(fp))
    b2 = dict(bands(near))
    assert any(b1[i] == b2[i] for i in range(4))


def test_analyze_stem_consistency():
    assert analyze("Running quickly", stem=True) == ["run", "quickli"]
    assert analyze("Running quickly", stem=False) == ["running", "quickly"]


def test_arrow_analyze_equivalence(spark, corpus_df):
    """mapInArrow analyze must emit exactly the pandas variant's rows."""
    from searchengine_spark.index import assign_docids
    from searchengine_spark.text.udfs import (
        POSTINGS_SCHEMA,
        make_analyze_partition,
        make_analyze_partition_arrow,
    )

    from pyspark.sql import functions as F

    # docid filter, not a bare limit — see the importance twin below
    src = assign_docids(corpus_df).filter(
        F.col("docid") <= 80
    ).select("docid", "content")
    a = src.mapInPandas(
        make_analyze_partition(stem=True), schema=POSTINGS_SCHEMA
    ).collect()
    b = src.mapInArrow(
        make_analyze_partition_arrow(stem=True), schema=POSTINGS_SCHEMA
    ).collect()
    key = lambda r: (r["docid"], r["term"])  # noqa: E731
    ka = sorted(
        (r["docid"], r["term"], r["tf"], list(r["positions"]),
         r["important"], r["total_tokens"]) for r in a)
    kb = sorted(
        (r["docid"], r["term"], r["tf"], list(r["positions"]),
         r["important"], r["total_tokens"]) for r in b)
    assert ka == kb and len(ka) > 0


def test_arrow_analyze_equivalence_with_importance(spark, corpus_df):
    """Arrow analyze with the importance extractor live must match the
    pandas variant row-for-row (including the priority field)."""
    from searchengine_spark.index import assign_docids
    from searchengine_spark.text.importance import extract_importance_text
    from searchengine_spark.text.udfs import (
        POSTINGS_SCHEMA,
        make_analyze_partition,
        make_analyze_partition_arrow,
    )
    from pyspark.sql import functions as F

    # deterministic subset: a bare limit() can return DIFFERENT rows
    # across the two collects below (task completion order under
    # load), making the equivalence flaky for reasons that have
    # nothing to do with the analyzers
    src = (
        assign_docids(corpus_df)
        .filter(F.col("docid") <= 60)
        .select("docid", "content", F.col("path"))
    )
    a = src.mapInPandas(
        make_analyze_partition(
            stem=True, importance_fn=extract_importance_text
        ),
        schema=POSTINGS_SCHEMA,
    ).collect()
    b = src.mapInArrow(
        make_analyze_partition_arrow(
            stem=True, importance_fn=extract_importance_text
        ),
        schema=POSTINGS_SCHEMA,
    ).collect()
    ka = sorted(
        (r["docid"], r["term"], r["tf"], list(r["positions"]),
         r["important"], r["total_tokens"]) for r in a)
    kb = sorted(
        (r["docid"], r["term"], r["tf"], list(r["positions"]),
         r["important"], r["total_tokens"]) for r in b)
    assert ka == kb and len(ka) > 0
    assert any(r[4] > 0 for r in ka)  # priorities actually fire


def test_extract_importance_text_title_tokens():
    """First-N tokens rank as title (priority 1); min-priority rule
    holds against the def-line rule."""
    from searchengine_spark.text.importance import (
        TITLE_TOKENS,
        extract_importance_text,
    )

    body = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    imp = extract_importance_text(body, "x/y.py")
    toks = body.split()
    for t in toks[:TITLE_TOKENS]:
        assert imp[t] == 1, t
    for t in toks[TITLE_TOKENS:]:
        assert t not in imp, t
    # def-line priority 2 loses to title priority 1 on the same token;
    # past the title window the def-line rule stands alone
    eight = "one two three four five six seven eight"
    assert extract_importance_text(f"{eight}\ndef one():\n")["one"] == 1
    assert extract_importance_text(f"{eight}\ndef alpha():\n")["alpha"] == 2


def test_parse_query_clauses():
    """The mini query language (text/querylang.py): bare tokens = must,
    quotes = phrase (tokens also score), -tok = must_not, lang:/source:
    = the metadata filters, anything else raises."""
    import pytest

    from searchengine_spark.text.querylang import parse_query

    p = parse_query('Spark query "Table HASH" -dup lang:en')
    assert p["must"] == ["spark", "query"]
    assert p["phrases"] == [["table", "hash"]]
    assert p["must_not"] == ["dup"]
    assert p["filters"] == {"lang": "en"}

    # source: is the other understood metadata field; both combine
    ps = parse_query("table source:src3 lang:en")
    assert ps["filters"] == {"lang": "en", "source": "src3"}
    # scoring = sorted distinct union of must + phrase tokens
    assert p["scoring"] == ["hash", "query", "spark", "table"]

    with pytest.raises(ValueError):
        parse_query("site:github.com spark")

    # punctuation splits like the tokenizer; empty clauses vanish
    p2 = parse_query('spark-shuffle "" -')
    assert p2["must"] == ["spark", "shuffle"]
    assert p2["phrases"] == []
    assert p2["must_not"] == []
    assert p2["filters"] == {}

    # -tok with punctuation expands to multiple NOT terms, deduped+sorted
    p3 = parse_query("query -b.a -a")
    assert p3["must_not"] == ["a", "b"]


def test_parse_query_wildcards():
    """Wildcard clauses: tok* = prefix, *tok = suffix — eligibility-only
    (constant-score rewrite), deduped+sorted; malformed patterns raise."""
    import pytest

    from searchengine_spark.text.querylang import parse_query

    p = parse_query('spark sc* *er sc* "table hash"')
    assert p["wildcards"] == [("prefix", "sc"), ("suffix", "er")]
    assert p["must"] == ["spark"]
    # wildcards never enter scoring
    assert p["scoring"] == ["hash", "spark", "table"]

    for bad in ("a*b", "*", "**", "*ab*", "-dup*", "lang:e*"):
        with pytest.raises(ValueError):
            parse_query(f"spark {bad}")


def test_parse_query_or_groups():
    """OR groups: a|b = one scoring slot (disjunctive within, the
    synonym-slot semantics); singleton slots for bare/phrase tokens;
    term overlap across slots raises; OR never combines with -/:/*."""
    import pytest

    from searchengine_spark.text.querylang import parse_query

    p = parse_query('spark part|stream "table hash" query|window')
    assert p["or_groups"] == [("part", "stream"), ("query", "window")]
    assert p["must"] == ["spark"]
    assert p["slots"] == [
        ("hash",), ("part", "stream"), ("query", "window"),
        ("spark",), ("table",),
    ]
    # scoring covers group terms too
    assert p["scoring"] == [
        "hash", "part", "query", "spark", "stream", "table", "window",
    ]
    # alternatives dedup; a one-alternative group is a bare token
    p2 = parse_query("a|b|a c|c")
    assert p2["or_groups"] == [("a", "b")]
    assert p2["must"] == ["c"]
    # queries without groups keep the old shape
    p3 = parse_query("spark query")
    assert p3["or_groups"] == []
    assert p3["slots"] == [("query",), ("spark",)]

    # a term may appear in only one scoring slot
    for bad in ("a|b a", "a|b b|c", 'a|b "b c"'):
        with pytest.raises(ValueError):
            parse_query(bad)
    # OR cannot combine with :/* (and multi-token alternatives raise)
    for bad in ("lang:a|b", "a*|b", "a.b|c"):
        with pytest.raises(ValueError):
            parse_query(bad)


def test_bpe_train_matches_classic_greedy(spark):
    """The distributed BPE trainer must equal the textbook algorithm:
    scan-based greedy left-to-right merge application (with skip), not
    just the fold both engines implement — proving fold == greedy."""
    import re
    from collections import Counter

    from searchengine_spark.ops.bpe import BPE_STEPS, bpe_train

    sf = "/root/testdata/sf0.001"
    words = Counter()
    for r in spark.read.parquet(f"{sf}/documents.parquet").collect():
        words.update(re.findall(r"[a-z0-9]+", r["text"].lower()))

    def greedy_apply(syms, l, r):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    vocab = {w: list(w) for w in words}
    want = []
    for step in range(BPE_STEPS):
        counts = Counter()
        for w, syms in vocab.items():
            f = words[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        (l, r), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        want.append((step, l, r, n))
        vocab = {w: greedy_apply(s, l, r) for w, s in vocab.items()}

    got = [
        (r["step"], r["lhs"], r["rhs"], r["n"])
        for r in bpe_train(spark, sf).collect()
    ]
    assert got == want
    # merges must actually chain (a later merge uses an earlier output)
    built = {l + r for _, l, r, _ in want}
    assert any(l in built or r in built for _, l, r, _ in want[1:])


def test_bpe_encode_matches_classic(spark):
    """Piece counts under the learned merges equal the textbook
    application: encode each word with the scan-based greedy merges in
    training order, sum per doc."""
    import re
    from collections import Counter

    from searchengine_spark.ops.bpe import (
        BPE_STEPS,
        bpe_encode,
        bpe_train,
    )

    sf = "/root/testdata/sf0.001"
    docs = {
        r["doc_id"]: re.findall(r"[a-z0-9]+", r["text"].lower())
        for r in spark.read.parquet(f"{sf}/documents.parquet").collect()
    }
    merges = [
        (r["lhs"], r["rhs"])
        for r in bpe_train(spark, sf).collect()
    ]
    assert len(merges) == BPE_STEPS

    def encode(word):
        syms = list(word)
        for l, r in merges:
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == l
                        and syms[i + 1] == r):
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    cache = {}
    want = {}
    for d, toks in docs.items():
        if not toks:
            continue
        want[d] = (len(toks),
                   sum(cache.setdefault(t, encode(t)) for t in toks))
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_pieces"])
        for r in bpe_encode(spark, sf).collect()
    }
    assert got == want
    # the learned tokenizer compresses: pieces < chars, > tokens
    for d, (nt, np_) in got.items():
        assert nt <= np_ <= sum(len(t) for t in docs[d])


def test_bpe_fertility_matches_classic(spark):
    """Per-lang fertility equals the textbook recomputation: encode
    every token with the scan-based greedy merges, sum words / pieces
    / chars per language, divide the exact integers."""
    import re

    from searchengine_spark.ops.bpe import bpe_fertility, bpe_train

    sf = "/root/testdata/sf0.001"
    rows = spark.read.parquet(f"{sf}/documents.parquet").collect()
    merges = [
        (r["lhs"], r["rhs"]) for r in bpe_train(spark, sf).collect()
    ]

    def encode(word):
        syms = list(word)
        for l, r in merges:
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == l
                        and syms[i + 1] == r):
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    cache = {}
    agg = {}
    for r in rows:
        toks = re.findall(r"[a-z0-9]+", r["text"].lower())
        if not toks:
            continue
        w, p, c = agg.get(r["lang"], (0, 0, 0))
        agg[r["lang"]] = (
            w + len(toks),
            p + sum(cache.setdefault(t, encode(t)) for t in toks),
            c + sum(len(t) for t in toks),
        )
    want = {
        lang: (w, p, c, round(p / w, 6), round(c / p, 6))
        for lang, (w, p, c) in agg.items()
    }
    got = {
        r["lang"]: (r["n_words"], r["n_pieces"], r["n_chars"],
                    r["pieces_per_word"], r["chars_per_piece"])
        for r in bpe_fertility(spark, sf).collect()
    }
    assert got == want


def test_parse_query_boosts():
    """`tok^w` boosts: parsed into boosts{} and must; eligibility
    machinery (slots/scoring) unchanged; every ambiguous or malformed
    combination raises."""
    import pytest

    from searchengine_spark.text.querylang import parse_query

    p = parse_query('spark query^2.5 "table hash" -dup')
    assert p["boosts"] == {"query": 2.5}
    assert "query" in p["must"] and ("query",) in p["slots"]
    assert p["scoring"] == sorted({"spark", "query", "table", "hash"})
    # repeated identical boost dedups; float syntax accepted
    assert parse_query("a^2 a^2.0 b")["boosts"] == {"a": 2.0}
    for bad in [
        "a^2 a^3",      # conflicting weights
        "a^2 a",        # boosted AND unboosted
        'a^2 "a b"',    # boosted AND in a phrase
        "-a^2",         # NOT
        "a*^2",         # wildcard
        "lang:en^2",    # field filter
        "a^",           # missing value
        "^2",           # missing base
        "a^2^3",        # double boost
        "a^0",          # non-positive
        "a^-1",
        "a^inf",        # non-finite
        "a^x",          # non-numeric
        "a.b^2",        # base tokenizes to two terms
    ]:
        with pytest.raises(ValueError):
            parse_query(f"spark {bad}")


def test_parse_query_or_group_composition():
    """OR groups compose with phrases, field filters, NOT, wildcards,
    and boosts ACROSS tokens (each clause keeps its own semantics);
    only within-token operator mixes raise."""
    from searchengine_spark.text.querylang import parse_query

    p = parse_query('spark part|stream query|window lang:en -dup')
    assert p["or_groups"] == [("part", "stream"), ("query", "window")]
    assert p["filters"] == {"lang": "en"}
    assert p["must_not"] == ["dup"]
    assert ("spark",) in p["slots"]

    p2 = parse_query('a|b "table hash" sc* src^2.0 source:src3')
    assert p2["or_groups"] == [("a", "b")]
    assert p2["wildcards"] == [("prefix", "sc")]
    assert p2["boosts"] == {"src": 2.0}
    assert p2["filters"] == {"source": "src3"}

    # :/* within a group stay refused
    import pytest as _pt
    for bad in ("lang:a|b", "a|b*"):
        with _pt.raises(ValueError):
            parse_query(bad)
    # cross-slot duplicates stay refused even with filters present
    with _pt.raises(ValueError):
        parse_query('spark spark|query lang:en')


def test_parse_query_or_group_not_and_boost():
    """Round-5 composition lifts: -a|b negates the WHOLE group (De
    Morgan — must_not both alternatives, no slot), and a^2|b boosts
    ONE alternative (slot unchanged, weight recorded); the genuinely
    ambiguous residue still raises."""
    import pytest

    from searchengine_spark.text.querylang import parse_query

    p = parse_query("spark part|stream -dup|slow")
    assert p["or_groups"] == [("part", "stream")]
    assert p["must_not"] == ["dup", "slow"]
    assert p["scoring"] == ["part", "spark", "stream"]

    p2 = parse_query('spark part^2|stream "table hash"')
    assert p2["or_groups"] == [("part", "stream")]
    assert p2["boosts"] == {"part": 2.0}
    assert p2["slots"] == [
        ("hash",), ("part", "stream"), ("spark",), ("table",),
    ]
    # weight agreement across clauses: the group's boost and a bare
    # boost of the same term must agree... but a bare repeat is a
    # cross-slot duplicate anyway; a DIFFERENT group-internal weight
    # for a repeated alternative raises
    with pytest.raises(ValueError):
        parse_query("a^2|a|b c")
    with pytest.raises(ValueError):
        parse_query("a^2|b a^3 c")   # conflicting weights (also dup slot)
    # '-' anywhere but the front raises (a silent tokenize would
    # swallow it); negated groups cannot carry boosts
    for bad in ("a|-b", "-a|b^2", "x|-y|z"):
        with pytest.raises(ValueError):
            parse_query(f"spark {bad}")
    # degenerate negated group == plain NOTs of one term
    p3 = parse_query("spark -a|a")
    assert p3["must_not"] == ["a"] and p3["or_groups"] == []

"""Deterministic synthetic corpus (FIXTURES.md §1-3).

Generates the 5-column input table pinned by BASELINE.json's input_hint —
``(repo, path, commit, lang, content)`` — replacing the reference's
directory of crawled JSON pages (makeindex.py:94-118).  Seeded, no
wall-clock entropy; the same (seed, n_docs) always produces byte-identical
rows, so goldens are stable.

Planted cases (mirroring the reference's filter chain, makeindex.py:116-213):
whitespace-only docs, exact-duplicate content pairs, simhash near-dup
pairs, stopword-heavy docs (skew/salting fixture), the code-literal
tokenizer fixture (TEST.txt:301-316), a rare term ("mondego",
TEST.txt:265), and a link graph with hub / authority / 2-cycle / isolated /
dangling-import nodes (FIXTURES.md §2).
"""

import hashlib
import random

from ..text.stopwords import STOPWORDS

_LANGS = ["python", "java", "c", "js", "md"]
_EXT = {"python": "py", "java": "java", "c": "c", "js": "js", "md": "md"}
_LANG_WEIGHTS = [5, 3, 2, 3, 1]

# theme words cover every term used by the 20-query fixture set
_THEME = (
    "parser notes spark shuffle lexer module sql binary tree node graph "
    "traversal python dynamically typed language hash bucket assignment "
    "welcome question assistance quantum computing advancements integer "
    "overflow cache policy big notation index merge posting compress "
    "partition executor cluster token stem query rank score document "
    "corpus engine stream batch memory disk thread lock queue stack heap "
    "array string buffer pointer function return class import def print "
    "hello world error test debug commit branch file line column row "
    "table schema type value key map set list dict loop while for if else"
).split()


def _vocab(rng):
    """5k-word vocabulary: stopwords first (highest Zipf mass → the skew
    fixture demanded by SURVEY.md §5.5), then theme words, then generated
    filler."""
    words = sorted(STOPWORDS) + list(_THEME)
    syll = [
        "ka", "ro", "mi", "ta", "zen", "lor", "bex", "dun", "fi", "gal",
        "hu", "jin", "kel", "lum", "nor", "pax", "qua", "rim", "sol", "tev",
    ]
    seen = set(words)
    while len(words) < 5000:
        w = "".join(rng.choice(syll) for _ in range(rng.randint(2, 4)))
        if w not in seen:
            seen.add(w)
            words.append(w)
    return words


def _zipf_sampler(rng, vocab):
    weights = [1.0 / (i + 1) for i in range(len(vocab))]
    total = sum(weights)
    cum = []
    acc = 0.0
    for w in weights:
        acc += w / total
        cum.append(acc)

    def draw():
        x = rng.random()
        lo, hi = 0, len(cum) - 1
        while lo < hi:
            mid = (lo + hi) // 2
            if cum[mid] < x:
                lo = mid + 1
            else:
                hi = mid
        return vocab[lo]

    return draw


def _commit(repo, path):
    return hashlib.sha256(f"{repo}/{path}".encode()).hexdigest()[:40]


def synth_corpus(n_docs=200, seed=42):
    """Return a list of row dicts (repo, path, commit, lang, content)."""
    assert n_docs >= 100, "planted cases need >=100 docs"
    rng = random.Random(seed)
    vocab = _vocab(rng)
    draw = _zipf_sampler(rng, vocab)

    keys = []
    for i in range(n_docs):
        repo = f"org{i % 7}/proj{i % 23}"
        lang = rng.choices(_LANGS, weights=_LANG_WEIGHTS)[0]
        path = f"src/m{i // 50}/f{i}.{_EXT[lang]}"
        keys.append((repo, path, lang))

    # import targets must be real, non-empty docs (docs 20-24 are empty,
    # doc 14 stays isolated)
    def target_ok(j):
        return j != 14 and not (20 <= j <= 24)

    # per-query planted sentences so conjunctive matches exist: docs with
    # index >= 75 and (i - 75) % 20 == (qid - 1) % 20 contain the query text
    plant = {}
    for qid, qtext in QUERIES:
        if qid == 3:
            continue  # the unknown-majority query must stay unmatched
        for i in range(75 + (qid - 1) % 20, n_docs, 20):
            plant.setdefault(i, []).append(qtext)

    n_topics = 12
    topic_slices = []
    filler = vocab[200:]  # beyond stopwords+theme
    step = len(filler) // n_topics
    for t in range(n_topics):
        topic_slices.append(filler[t * step : (t + 1) * step])

    rows = []
    for i, (repo, path, lang) in enumerate(keys):
        # diversified content: a per-doc topic slice dominates, with global
        # Zipf (stopword-heavy) draws mixed in — keeps the skew fixture but
        # avoids accidental corpus-wide simhash collisions
        topic = topic_slices[i % n_topics]
        n_body = rng.randint(40, 220)
        body = []
        for _ in range(n_body):
            r = rng.random()
            if r < 0.55:
                body.append(rng.choice(topic))
            elif r < 0.75:
                body.append(rng.choice(_THEME))
            else:
                body.append(draw())
        title = [rng.choice(topic) for _ in range(rng.randint(2, 6))]
        imports = []

        if i == 10:  # hub: links to 20+ docs
            tgts = [j for j in range(30, 55) if target_ok(j)]
        elif i == 12:
            tgts = [13]
        elif i == 13:
            tgts = [12]
        elif i == 14:  # isolated
            tgts = []
        elif i == 15:  # dangling import source
            tgts = []
            imports.append("import orgX/projX:src/missing/f999.py")
        else:
            n_imp = rng.randint(0, 3)
            tgts = []
            for _ in range(n_imp):
                j = rng.randrange(n_docs)
                if target_ok(j) and j != i:
                    tgts.append(j)
            if 100 <= i < 125:  # authority: doc 11 imported by 20+ docs
                tgts.append(11)
        for j in tgts:
            tr, tp, _ = keys[j]
            imports.append(f"import {tr}:{tp}")

        if 20 <= i <= 24:  # whitespace-only (empty filter fixture)
            content = "   \n\t  \n"
        elif i in (31, 33, 35, 37, 39):  # exact duplicate of i-1
            content = rows[i - 1]["content"]
        elif i in (41, 43, 45, 47, 49):  # near-duplicate of i-1 (+2 tokens)
            content = rows[i - 1]["content"] + " " + draw() + " " + draw()
        elif i in (50, 51, 52):  # stopword-heavy (>80% stopwords)
            sw = sorted(STOPWORDS)
            toks = [rng.choice(sw) for _ in range(400)] + [draw() for _ in range(40)]
            rng.shuffle(toks)
            content = " ".join(toks)
        else:
            extra = []
            if i in (60, 61):
                extra.append("mondego")
            if i in (65, 66):
                extra.append('print("Hello world!")')
            if i in (70, 71, 72):
                extra.append("advancements in quantum computing")
            extra.extend(plant.get(i, []))
            content = "\n".join(
                [" ".join(title)] + imports + [" ".join(body)] + extra
            )

        rows.append(
            {
                "repo": repo,
                "path": path,
                "commit": _commit(repo, path),
                "lang": lang,
                "content": content,
            }
        )
    return rows


# The 20-query fixture set: reference query *shapes* (TEST.txt:51-450)
# adapted to the code corpus (FIXTURES.md §3).
QUERIES = [
    (1, "parser notes"),
    (2, "spark shuffle"),
    (3, "zzzqx vvkwq qqqpt parser"),  # unknown-majority → must return []
    (4, "SQL"),
    (5, "binary tree node 46"),
    (6, "graph traversal"),
    (7, "python is a dynamically typed language"),
    (8, "hash bucket"),
    (9, "assignment 1 module 121"),
    (10, "welcome to parser"),
    (11, "to be or not to be that is the question"),
    (12, "import"),
    (13, "mondego"),
    (14, "I need assistance"),
    (15, 'print("Hello world!")'),
    (16, "Advancements in quantum computing"),
    (17, "the way that something is done in a large cluster is to "
         "partition the data and shuffle it between executor nodes "
         "while the index and cache stay warm for every query"),
    (18, "integer overflow"),
    (19, "cache policy"),
    (20, "big o notation"),
]

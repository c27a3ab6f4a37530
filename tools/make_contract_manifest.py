"""Machine-readable contract manifest + stratified correctness sample.

The driver's CORRECTNESS gate samples ~50 of the (currently 159)
queries()/oracle_sql() entries per round; r3 and r4 checked the SAME
50, so round-new entries never got a driver row (VERDICT r4 #5).  This
script publishes, per entry: its FAMILY, its measured sf0.01 wall
(from tools/contract_walls_r5.json), whether it has a SQL
oracle, and the round it was added — plus a SUGGESTED stratified
50-entry sample that (a) includes every entry added in the last two
rounds, (b) covers every family with at least one row, and (c) fills
the remainder by a deterministic per-round rotation
(md5(name || round) order), so successive rounds walk the whole
surface instead of re-checking a frozen subset.

Run:  python tools/make_contract_manifest.py [round_tag]
Writes tools/contract_manifest.json (committed).
"""

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

# ordered prefix/name → family rules; first match wins
FAMILY_RULES = [
    (("tpch_",), "tpch"),
    (("bpe_",), "bpe"),
    (("media_",), "multimodal"),
    (("ann_", "ivf_stats", "pq_codes", "embedding_"), "vectors"),
    (("engine_topk", "segments_topk"), "engine_flagship"),
    (("dedup_", "dup_", "span_dedup", "strip_dup_spans", "winnow_",
      "ngram_jaccard", "topk_overlap_pairs", "dupgraph_triangles",
      "doc_fingerprint", "pagerank_dupgraph"), "dedup"),
    (("events_", "user_sessions", "event_", "value_", "funnel_",
      "retention_", "props_stats", "asof_attribution", "burst_pairs",
      "bucketed_revenue", "pricing_rollup"), "events"),
    (("training_", "decontaminate", "contamination_report",
      "stratified_sample", "corpus_mixture", "temperature_",
      "corpus_split", "source_caps", "pii_", "kmv_distinct",
      "cms_heavy_hitters", "weighted_sample", "pack_sequences"),
     "curation"),
    (("lang_id", "token_counts", "text_quality", "gopher_quality",
      "repetition_stats", "perplexity_buckets", "lang_counts",
      "top_terms_per_lang", "df_histogram", "significant_terms",
      "kwic", "collocations", "unigram_logprob", "bigram_logprob"),
     "textstats"),
    (("term_tf", "doc_length", "term_dict", "corpus_stats",
      "warc_roundtrip", "match_counts", "stored_fields",
      "index_stats_flat"), "core_index"),
    (("phrase_match", "proximity_topk", "span_near_topk",
      "phrase_slop", "substring_", "regex_", "chunk_docs",
      "passage_topk", "window_snippets", "highlight_topk"),
     "positions"),
    (("prefix_topk", "facet_counts", "relaxed_topk", "msm_topk",
      "diversified_topk", "synonym_topk", "query_", "related_terms",
      "suffix_topk", "search_after_topk", "explain_score",
      "percolate", "fuzzy_terms", "phrase_suggest", "corrected_topk"),
     "query_surface"),
    (("bm25_", "stemmed_topk", "wand_", "lm_dirichlet_topk",
      "hashed_tfidf_topk", "hybrid_rrf_topk", "tfidf_keywords",
      "more_like_this", "rocchio_topk", "mmr_topk", "result_clusters",
      "search_eval_", "hard_negatives", "ltr_features",
      "term_vectors"), "ranking"),
]

# entries landed after the frozen r3/r4 driver sample — must be sampled
ADDED_LATE = {
    "regex_alt_search": "r4",
    "regex_alt_search_persisted": "r4",
    "engine_topk_ondisk_bm25f": "r4",
    "query_or_filter_topk": "r4",
    "contamination_report": "r4",
    "query_or_not_topk": "r5",
    "query_or_boost_topk": "r5",
    "percolate_or": "r5",
    "tpch_q6": "r5",
    "tpch_q19": "r5",
}


def family_of(name: str) -> str:
    for prefixes, fam in FAMILY_RULES:
        for p in prefixes:
            if name == p or name.startswith(p):
                return fam
    raise SystemExit(f"no family rule for entry {name!r} — add one")


def main(round_tag: str = "r5") -> None:
    qs = list(entrymod.queries())
    osql = entrymod.oracle_sql()
    walls_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "contract_walls_r5.json",
    )
    walls = {}
    if os.path.exists(walls_path):
        with open(walls_path) as f:
            walls = json.load(f).get("per_entry", {})

    entries = {
        n: {
            "family": family_of(n),
            "wall_sec_sf001": walls.get(n),
            "has_oracle": n in osql,
            "added": ADDED_LATE.get(n, "r1-r3"),
        }
        for n in qs
    }

    # stratified 50: all late additions + >=1 per family + rotation fill
    def rot_key(n: str) -> str:
        return hashlib.md5(f"{n}|{round_tag}".encode()).hexdigest()

    sample = [n for n in qs if n in ADDED_LATE]
    fams_covered = {entries[n]["family"] for n in sample}
    by_rot = sorted(qs, key=rot_key)
    for n in by_rot:
        f = entries[n]["family"]
        if f not in fams_covered:
            sample.append(n)
            fams_covered.add(f)
    for n in by_rot:
        if len(sample) >= 50:
            break
        if n not in sample:
            sample.append(n)
    assert len(set(sample)) == len(sample) <= 50
    assert {entries[n]["family"] for n in sample} == {
        e["family"] for e in entries.values()
    }

    out = {
        "round": round_tag,
        "n_entries": len(qs),
        "n_with_oracle": sum(1 for n in qs if n in osql),
        "families": sorted({e["family"] for e in entries.values()}),
        "entries": entries,
        "suggested_sample": sorted(sample),
        "note": (
            "suggested_sample is deterministic per round_tag: all "
            "r4/r5-new entries + >=1 per family + md5(name|round) "
            "rotation fill to 50 — successive rounds walk the whole "
            "159-entry surface"
        ),
    }
    dst = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "contract_manifest.json",
    )
    with open(dst, "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
    print(f"wrote {dst}: {len(qs)} entries, "
          f"{len(sample)}-entry suggested sample, "
          f"{len(out['families'])} families")


if __name__ == "__main__":
    main(*sys.argv[1:2])

#!/usr/bin/env python3
"""Fleet-wide physical-plan smell audit over PlanDump output.

Scans every dumped plan for the operator smells that kill 100 TB runs
and prints one line per hit, with a whitelist for the shapes that are
intentional (bounded witness frames, probe panels, tiny carry-in
windows). Run after:

    sbt "runMain graft.PlanDump /root/testdata/sf0.001 target/plans"
    python3 tools/plan_audit.py target/plans
"""
import pathlib
import re
import sys

PLANS = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "target/plans")

# (pattern, why it matters at scale)
SMELLS = [
    ("CartesianProduct", "unbounded cross product"),
    ("BroadcastNestedLoopJoin", "non-equi join fallback"),
    ("PLAN FAILED", "query failed to plan"),
]

# query -> (max raw pattern count, reason the shape is intentional).
# every entry here must be a BOUNDED side (witness frame, probe panel,
# driver-literal model) — never data x data. The count pins the SANCTIONED
# shape: formatted plans print each operator twice (tree + detail), so one
# logical BNLJ == 2 raw hits; a query whose count grows past its recorded
# allowance regressed to a new nested loop and is flagged, not waved OK.
ALLOW = {
    "BroadcastNestedLoopJoin": {
        "q_similarity_topk": (2, "bounded query panel x corpus (brute-force ANN baseline)"),
        "q_similarity_lsh": (2, "bounded query panel; bucket-pruned candidates"),
        "q_similarity_ivf": (4, "bounded query panel x probed cells"),
        "q_ann_incremental": (2, "bounded query panel x the O(centroidCap) broadcast centroid frame (probe pick); postings join is an equi-join on cell"),
        "q_similarity_pq": (2, "bounded query panel; ADC over members"),
        "q_similarity_ivfpq": (6, "bounded query panel; probed-cell members only"),
        "q_similarity_ivfpq_loaded": (6, "same serving operators as q_similarity_ivfpq, models from the parquet artifact"),
        "q_similarity_ivfpq_served": (4, "centroid assign/probe cross the collection with the O(centroidCap) broadcast centroid FRAME (file-served model; encode/ADC are equi-joins)"),
        "q_quality_score": (2, "1-row training-totals witness crossed into the 64-bucket weight frame"),
        "q_ann_recall": (12, "bounded query panel (recall yardstick)"),
        "q_embed_neardup": (2, "bounded probe panel"),
        "q_dedup_recall": (4, "bounded 60-doc probe panel (truth side)"),
        "q_decontaminate": (2, "1-row scalar witness"),
        "q_corpus_prep": (2, "1-row thresholds witness"),
        "q_outliers": (2, "1-row bounds witness"),
        "q_winsorize": (2, "1-row quantile witness"),
        "q_stratified_sample": (2, "1-row denominator witness"),
        "q_weighted_sample": (2, "1-row threshold witness"),
        "q_quality_rules": (2, "1-row stats witness"),
        "q_repetition": (2, "1-row stats witness"),
        "q_data_checks": (2, "1-row stats witness"),
        "q_profile": (2, "1-row stats row"),
        "q_profile_sketch": (2, "1-row stats row"),
        "q_bank_conservation": (2, "1-row totals witness"),
        "q_bm25": (2, "tiny query-terms frame"),
        "q_hybrid_search": (4, "1-row corpus-stats + 1-row query-vector witnesses"),
        "q_tfidf_terms": (2, "corpus-stats witness"),
        "q_unigram_lm": (2, "1-row totals witness"),
        "q_text_quality": (2, "1-row corpus stats"),
        "q_lang_id": (2, "tiny language-profile frame"),
        "q_vocab_topk": (2, "1-row totals witness"),
        # spot-verified in target/plans: every BNLJ below is BuildRight
        # IdentityBroadcastMode over a 1-row aggregate (scalar witness)
        "q_approx_quantiles": (2, "1-row sketch witness"),
        "q_binary_hist": (2, "1-row size-bounds witness"),
        "q_cust_idle": (2, "Q22 scalar avg-acctbal witness"),
        "q_ivf_kmeans": (2, "1-row training-stats witness"),
        "q_kmv_setops": (2, "1-row sketch witnesses"),
        "q_merge_upsert": (4, "1-row version scalar per arm"),
        "q_revenue_share": (2, "Q11 scalar total-value threshold"),
        "q_snapshot_consistency": (2, "1-row snapshot totals"),
        "q_snapshot_diff": (6, "1-row version scalars"),
        "q_stream_binary": (2, "1-row corpus-stats witness"),
        "q_stream_quantiles": (2, "1-row quantile witness"),
        "q_wal_gapcheck": (2, "two 1-row gap summaries crossed"),
    },
    "CartesianProduct": {},
}


def main() -> int:
    bad = 0
    for f in sorted(PLANS.glob("*.txt")):
        text = f.read_text()
        name = f.stem
        for pat, why in SMELLS:
            n = len(re.findall(pat, text))
            if not n:
                continue
            allowed = ALLOW.get(pat, {}).get(name)
            if allowed and n <= allowed[0]:
                print(f"OK    {name}: {n}x {pat} ({allowed[1]})")
            elif allowed:
                print(
                    f"SMELL {name}: {n}x {pat} exceeds allowance "
                    f"{allowed[0]}x ({allowed[1]}) — {why}"
                )
                bad += 1
            else:
                print(f"SMELL {name}: {n}x {pat} — {why}")
                bad += 1
    print(f"\n{bad} unexplained smells")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())

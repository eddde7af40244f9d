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

# query -> allowed smells with the reason the shape is intentional.
# every entry here must be a BOUNDED side (witness frame, probe panel,
# driver-literal model) — never data x data.
ALLOW = {
    "BroadcastNestedLoopJoin": {
        "q_similarity_topk": "bounded query panel x corpus (brute-force ANN baseline)",
        "q_similarity_lsh": "bounded query panel; bucket-pruned candidates",
        "q_similarity_ivf": "bounded query panel x probed cells",
        "q_similarity_pq": "bounded query panel; ADC over members",
        "q_similarity_ivfpq": "bounded query panel; probed-cell members only",
        "q_ann_recall": "bounded query panel (recall yardstick)",
        "q_embed_neardup": "bounded probe panel",
        "q_dedup_recall": "bounded 60-doc probe panel (truth side)",
        "q_decontaminate": "1-row scalar witness",
        "q_corpus_prep": "1-row thresholds witness",
        "q_outliers": "1-row bounds witness",
        "q_winsorize": "1-row quantile witness",
        "q_stratified_sample": "1-row denominator witness",
        "q_weighted_sample": "1-row threshold witness",
        "q_quality_rules": "1-row stats witness",
        "q_repetition": "1-row stats witness",
        "q_data_checks": "1-row stats witness",
        "q_profile": "1-row stats row",
        "q_profile_sketch": "1-row stats row",
        "q_bank_conservation": "1-row totals witness",
        "q_bm25": "tiny query-terms frame",
        "q_tfidf_terms": "corpus-stats witness",
        "q_unigram_lm": "1-row totals witness",
        "q_text_quality": "1-row corpus stats",
        "q_lang_id": "tiny language-profile frame",
        "q_vocab_topk": "1-row totals witness",
        # spot-verified in target/plans: every BNLJ below is BuildRight
        # IdentityBroadcastMode over a 1-row aggregate (scalar witness)
        "q_approx_quantiles": "1-row sketch witness",
        "q_binary_hist": "1-row size-bounds witness",
        "q_cust_idle": "Q22 scalar avg-acctbal witness",
        "q_ivf_kmeans": "1-row training-stats witness",
        "q_kmv_setops": "1-row sketch witnesses",
        "q_merge_upsert": "1-row version scalar per arm",
        "q_revenue_share": "Q11 scalar total-value threshold",
        "q_snapshot_consistency": "1-row snapshot totals",
        "q_snapshot_diff": "1-row version scalars",
        "q_stream_binary": "1-row corpus-stats witness",
        "q_stream_quantiles": "1-row quantile witness",
        "q_wal_gapcheck": "two 1-row gap summaries crossed",
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
            if allowed:
                print(f"OK    {name}: {n}x {pat} ({allowed})")
            else:
                print(f"SMELL {name}: {n}x {pat} — {why}")
                bad += 1
    print(f"\n{bad} unexplained smells")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())

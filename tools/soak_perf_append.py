#!/usr/bin/env python3
"""Append one round's decade-soak per-family exponent table to PERF.md
(r13 verdict #1: the soak is a standing gate step and PERF.md carries a
round-over-round exponent history, so a family-level regression is
visible as a trend, not just a one-round gate failure).

    python3 tools/soak_perf_append.py /tmp/soak_registry.tsv PERF.md \
        --label r14

Families are classified from op names (ordered first-match rules,
mirroring the round-13 write-up's families). Only measured rows enter
the stats: `overhead` (small-side < 150 ms — fixed per-query cost
dominates), `guard` (documented quadratic-contract abort), and
`failed` rows are counted but excluded from median/max.
"""
import argparse
import re
import statistics
import sys

SECTION = "## Decade-soak exponent history (standing gate step)"

FAMILIES = [
    ("streaming", r"^q_stream_"),
    ("bpe", r"^q_bpe_"),
    ("graph", r"^q_(pagerank|lpa_|kcore|communities|triangle)"),
    ("vector-trained", r"(_trained$|^q_imi_|_lloyd$)"),
    ("vector-ann", r"^q_(ann_|pq_|embed_|knn_|semdedup|hard_negatives|"
                   r"cluster_rep|clean_embeddings|rand_proj|hash_embed|"
                   r"quantize_int8|lsh_recall)"),
    ("dedup-text", r"^q_(dedup|minhash|simhash|ngram_jaccard|containment|"
                   r"fuzzy|entity|span_|chunk_dedup|dup_clusters|"
                   r"doc_fingerprint)"),
    ("curation-packing", r"^q_(pack|mix|.*sample|epoch_shuffle|shard|"
                         r"pii|decontaminate|train_test_split|"
                         r"temperature|clean_corpus|pipeline)"),
    ("text-analysis", r"^q_(bm25|tfidf|lang_id|quality|ppl|bigram|"
                      r"collocations|vocab_growth|repetition|"
                      r"text_quality|dsir|drift|data_card|doc_chunks)"),
    ("multimodal", r"^q_(media|multimodal)"),
    ("ingest-sinks-tx", r"^q_(csv_ingest|jsonl|feed|upsert|tx_|"
                        r"time_travel|change_feed|orc|schema_probe|"
                        r"sql_entry|json_|zorder|compaction|colocated)"),
    ("incremental-cdc", r"^q_(scd2|cdc|mv_refresh|sketch_mv|.*_incr)"),
    ("asof-windows", r"^q_(asof|.*window|sessionize|funnel|ntile|"
                     r"moving|tumbling|gap_fill|winsorize|best_of_day|"
                     r"topk|cohort|rolling)"),
    ("aggregates", r"^(q1_agg|q_(rollup|cube|pivot|histogram|"
                   r"heavy_hitters|approx|kmv|cms|anomaly|profile|"
                   r"dq_checks|sales))"),
    ("relational", r"."),
]


def family(name):
    for fam, pat in FAMILIES:
        if re.search(pat, name):
            return fam
    return "relational"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("tsv")
    ap.add_argument("perf_md")
    ap.add_argument("--label", required=True,
                    help="round tag for the history, e.g. r14")
    args = ap.parse_args()

    rows = []
    with open(args.tsv) as f:
        header = f.readline().rstrip("\n").split("\t")
        for line in f:
            parts = line.rstrip("\n").split("\t")
            rows.append(dict(zip(header, parts)))
    if not rows:
        print("[soak-perf] empty TSV — nothing to append")
        return 1

    fams = {}
    skipped = {"overhead": 0, "guard": 0, "failed": 0}
    for r in rows:
        st = r["status"]
        if st in skipped:
            skipped[st] += 1
            if st != "overhead":
                # guard/failed names are part of the record
                skipped.setdefault(st + "_names", []).append(r["name"])
            continue
        fams.setdefault(family(r["name"]), []).append(
            (float(r["exp"]), r["name"]))

    lines = [f"### {args.label} — {len(rows)} ops "
             f"({skipped['overhead']} overhead-skipped, "
             f"{skipped['guard']} guard, {skipped['failed']} failed)", "",
             "| family | n | median exp | max exp | worst op |",
             "|---|---|---|---|---|"]
    for fam in sorted(fams):
        exps = sorted(fams[fam])
        med = statistics.median(e for e, _ in exps)
        mx, worst = exps[-1]
        lines.append(f"| {fam} | {len(exps)} | {med:.2f} | {mx:.2f} |"
                     f" {worst} |")
    for key in ("guard_names", "failed_names"):
        if skipped.get(key):
            lines.append("")
            lines.append(f"{key.replace('_names', '')}: "
                         + ", ".join(skipped[key]))
    block = "\n".join(lines) + "\n"

    with open(args.perf_md) as f:
        perf = f.read()
    if SECTION not in perf:
        perf += (f"\n{SECTION}\n\n"
                 "Appended by tools/soak_perf_append.py from each "
                 "round-close gate run of tools/SoakRegistry "
                 "(sf0.1 vs the /tmp/graft_sf1 replicated twin, "
                 "bound-enforced). Compare a family's median/max "
                 "across rounds to spot slow regressions the per-round "
                 "bound alone would miss.\n\n")
    if f"### {args.label} —" in perf:
        print(f"[soak-perf] label {args.label} already recorded — "
              "skipping duplicate append")
        return 0
    perf += block + "\n"
    with open(args.perf_md, "w") as f:
        f.write(perf)
    print(f"[soak-perf] appended {args.label}: "
          f"{sum(len(v) for v in fams.values())} measured ops, "
          f"{len(fams)} families")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env bash
# The sf10 heavy-key scale rung as ONE documented command (r11 verdict
# item 5): reruns the PLANS.md heavy-30 sitting against the committed
# BENCH_sf10_heavy.json trailing reference, with Bench's own 1.2x-ref
# retry rule catching inflated keys — so a scale regression surfaces as
# CI shape, not a bespoke session.
#
# Usage: scripts/bench_heavy.sh [sfdir] [out.json] [ref.json]
#   sfdir  default testdata-sf10  (regenerate first: scripts/gen_sf1.py
#          then scripts/gen_sf10.py — both rebuild from the CURRENT
#          driver-generated /root/testdata lineage; they are gitignored)
#   out    default BENCH_sf10_heavy_new.json (NEVER the committed file —
#          promote by copying over BENCH_sf10_heavy.json deliberately)
#   ref    default BENCH_sf10_heavy.json (the trailing reference; a warm
#          min above max(1.2x ref, ref+0.15s) triggers scrub + redo)
#
# Run EXCLUSIVELY — kill sbt/test JVMs first; local[32] contention
# inflates heavy keys 3-6x and wastes the sitting (~15 min).
set -euo pipefail
cd "$(dirname "$0")/.."

HEAVY_KEYS="corpus_curation_report,corpus_leakage_audit,corpus_pipeline_e2e,\
corpus_span_clean,dedup_cluster_components,dedup_cluster_stats,\
dedup_jaccard_prefix,dedup_keep_canonical,dedup_keep_canonical_lev,\
dedup_keep_canonical_prefix,dedup_keep_canonical_winnowing,dedup_lev_recall,\
dedup_levenshtein_block,dedup_lsh_band_curve,dedup_minhash_lsh,\
dedup_ngram_jaccard,dedup_recall,dedup_winnowing_recall,flush_size_threshold,\
graph_hits,graph_modularity,q1_agg,q21_sole_blame_supplier,q_gap_fill,\
ann_graph_search,ann_ivf_pq_full,ann_nndescent_recall,ann_recall,\
corpus_cdc_clean,corpus_embed_pipeline"

export SPARK_GRAFT_SF_DIR="${1:-testdata-sf10}"
export SPARK_GRAFT_BENCH_OUT="${2:-BENCH_sf10_heavy_new.json}"
export SPARK_GRAFT_BENCH_REF="${3:-BENCH_sf10_heavy.json}"
export SPARK_GRAFT_KEYS="$HEAVY_KEYS"
export SPARK_GRAFT_BENCH_RUNS="${SPARK_GRAFT_BENCH_RUNS:-2}"

if [ ! -d "$SPARK_GRAFT_SF_DIR" ]; then
  echo "missing $SPARK_GRAFT_SF_DIR — run scripts/gen_sf1.py then" \
       "scripts/gen_sf10.py first" >&2
  exit 1
fi
sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' || true
echo "full per-key detail: $SPARK_GRAFT_BENCH_OUT" >&2

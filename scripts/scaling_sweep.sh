#!/bin/bash
# Scaling sweep for the heavy dedup/ANN/components tier (VERDICT r9 #1):
# bench the 15 heavy queries at sf0.1 (driver data) and at the ScaleUp-
# replicated sf0.5/sf1.0, 3 reps each (Bench reports the per-query MIN),
# collecting one bench_last.json per scale point under target/scale/.
# Fit exponents + render SCALING.md with scripts/scaling_fit.py.
#
# Usage: scripts/scaling_sweep.sh   (from /root/repo, after
#        `runMain graft.ScaleUp /root/testdata/sf0.1 target/scale/sfX k`)
set -euo pipefail
cd "$(dirname "$0")/.."

# The underscore after each short prefix is MANDATORY — 'q15' with an
# optional separator would also match q150_funnel. q150 itself entered
# the sweep in round 12 when ScaleUp.scaleEvents started replicating
# the events table (it copied verbatim before, which would have
# "scaled" the funnel over constant input).
REGEX='^(q15_|q20_|q22_|q51_|q68_|q83_|q94_|q103_|q104_|q108_|q110_|q113_|q114_|q116_|q117_|q122_pca_cov|q124_video_neardup_prod|q125_|q127_|q129_|q136_|q137_|q138_|q139_|q140_|q146_|q147_|q148_|q149_|q150_|q151_|q152_|q153_|q154_|q155_|q156_|q157_|q158_|q159_|q160_|q161_|q162_|q163_|q164_|q167_|q168_|q169_|q170_|q171_|q172_|q173_|q175_|q176_|q177_|q178_|q179_|q180_|q181_|q182_|q183_|q184_|q185_|q186_|q188_|q189_|q190_|q191_|q193_|q194_|q198_|q199_|q201_|q203_|q206_|q208_|q209_|q213_|q214_|q215_|q216_|q217_|q218_|q219_|q220_|q221_|q223_|q224_|q225_|q226_|q227_|q228_|q229_|q230_|q231_|q232_|q233_|q234_|q235_|q236_|q237_|q238_|q239_|q240_|q241_|q242_|q243_|q244_|q245_|q246_|q247_|q248_|q250_|q251_|q252_|q253_|q254_|q255_|q256_|q259_|q260_|q262_|q263_|q264_|q265_|q266_|q267_|q268_|q269_|q270_|q271_|q272_|q273_|q274_)'
# Round-15 additions: q263-q271 (the TPC-H queries unlocked by the
# derived-schema extension — all over the replicated relational
# universe), q262/q272-q274 (the maintained-ER tier: build + forget,
# normalized, streamed forget — customer names replicate with
# radius-disjoint suffixes so the match work recurs once per replica).
# Round-12 additions: q191/q194/q199/q201/q203 (events-based — ScaleUp
# replicates events) and q193/q198 (documents-based); q208/q213
# (events), q214 (documents).
# Round-13 additions (r12 verdict item 1): ScaleUp.scaleRelational now
# replicates orders/lineitem/customer/part/supplier as k disjoint
# relational universes, so the graph tier q177/q184/q188/q190/q206/
# q217 (lineitem co-purchase), q189 (customer names), and the orders
# tier q168/q169/q171/q183/q209/q215/q216/q218 produce honest
# corpus-vs-wall rows. q190/q206 note: seeds stay the single earliest
# order's basket (a fixed-size query set — the serving shape), so
# their rows measure edge-build + frontier-join cost against a ×k
# graph, not ×k frontier mass. Still out: q197/q212 (driver folds over
# the CALENDAR day domain, which replication does not grow), and q222
# (supplier×nation top-3 — nation is a verbatim-copied bounded dim).
# Late round-13: q219/q220 (ALS over orders⋈lineitem), q221 (dashboard
# SQL), q223 (events SQL), q224 (stats artifact serve — expected flat),
# q225 (RANGE-frame rolling revenue — per-day agg scales, window is
# calendar-bounded), q226 (GROUPING SETS lattice), q227 (unpivot),
# q228 (entity resolution — customer names replicate with ≥2-edit
# suffixes, so match clusters recur once per replica), q229–q234 (the
# TPC-H battery over the replicated relational universe).
# Session-2 round-13: q240–q244 (TPC-H Q7/Q8/Q13/Q15/Q22 over the
# replicated universe), the eval tier q245/q255 (documents score
# histograms), q246/q251 (documents scans — q251 is the AC kernel),
# q247 (orders⋈customer OLS moments), q248 (events median/MAD),
# q250/q253/q256 (events groupBy + self-join / stump chain / ranking),
# q252 (rare-gram graph modularity — the q68 edge cost family),
# q254 (orders percentile histogram). Round-14: q259 (documents bigram
# PMI — corpus-sized token/bigram aggregates, the q193/q198 family),
# q260 (seasonal decompose — the corpus-sized daily groupBy scales,
# window is calendar-bounded, the q225 discipline). Out: q249/q258
# (Holt, Kaplan-Meier — the q197/q212 calendar-day driver-fold family:
# the corpus pass is one groupBy, the recurrence runs on the bounded
# day/duration domain), q257 (MMR — the greedy runs on a fixed
# 12-candidate shortlist; its corpus-sized rel scan is the q23 brute
# kernel already swept via q114/q136).
mkdir -p target/scale
for sf in 0.1 0.5 1.0; do
  if [ "$sf" = "0.1" ]; then DIR=/root/testdata/sf0.1; else DIR="target/scale/sf$sf"; fi
  echo "=== scaling sweep sf=$sf dir=$DIR"
  SPARK_GRAFT_SF_DIR="$DIR" SPARK_GRAFT_BENCH_ONLY="$REGEX" SPARK_GRAFT_BENCH_REPS=3 \
    sbt -batch "runMain graft.Bench" 2>&1 | grep -E "^BENCH|Nonzero" || true
  cp target/bench_last.json "target/scale/bench_sf$sf.json"
done
echo "=== sweep complete: target/scale/bench_sf{0.1,0.5,1.0}.json"

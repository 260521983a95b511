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
# q168/q169/q171 (orders/lineitem-based) stay OUT: ScaleUp copies those
# tables verbatim, so their "scaling" would measure constant input.
# Same for the round-12 lineitem-graph pair q177/q184 and the
# orders-joining q183.
REGEX='^(q15_|q20_|q22_|q51_|q68_|q83_|q94_|q103_|q104_|q108_|q110_|q113_|q114_|q116_|q117_|q122_pca_cov|q124_video_neardup_prod|q125_|q127_|q129_|q136_|q137_|q138_|q139_|q140_|q146_|q147_|q148_|q149_|q150_|q151_|q152_|q153_|q154_|q155_|q156_|q157_|q158_|q159_|q160_|q161_|q162_|q163_|q164_|q167_|q170_|q172_|q173_|q175_|q176_|q178_|q179_|q180_|q181_|q182_|q185_|q186_|q191_|q193_|q194_|q198_|q199_|q201_|q203_|q208_|q213_|q214_)'
# Round-12 additions: q191/q194/q199/q201/q203 (events-based — ScaleUp
# replicates events) and q193/q198 (documents-based). The rest of the
# q189-q205 batch reads customer/orders/lineitem, which ScaleUp copies
# verbatim — constant-input "scaling" rows would be noise, so they stay
# out (the q168/q169/q171 rule). Late round-12: q208/q213 (events),
# q214 (documents); q209-q212/q215 are orders/lineitem -> out.
mkdir -p target/scale
for sf in 0.1 0.5 1.0; do
  if [ "$sf" = "0.1" ]; then DIR=/root/testdata/sf0.1; else DIR="target/scale/sf$sf"; fi
  echo "=== scaling sweep sf=$sf dir=$DIR"
  SPARK_GRAFT_SF_DIR="$DIR" SPARK_GRAFT_BENCH_ONLY="$REGEX" SPARK_GRAFT_BENCH_REPS=3 \
    sbt -batch "runMain graft.Bench" 2>&1 | grep -E "^BENCH|Nonzero" || true
  cp target/bench_last.json "target/scale/bench_sf$sf.json"
done
echo "=== sweep complete: target/scale/bench_sf{0.1,0.5,1.0}.json"

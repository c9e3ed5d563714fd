#!/usr/bin/env bash
# Scaling-curve experiment: derive sf1 locally from sf0.1 (16x replication
# with key remapping — graft.ScaleUp), then profile the slowest queries at
# both scales and compare wall time + shuffle volume. The third run
# disables broadcast joins at sf0.1 to expose the LINEAR SHUFFLE ENVELOPE:
# a query whose raw sf1/sf0.1 shuffle ratio exceeds 16x only because a
# join side outgrew spark.sql.autoBroadcastJoinThreshold is scaling
# correctly if its sf1 volume sits at or below 16x the no-broadcast
# sf0.1 volume. Results are recorded in COVERAGE.md.
#
# Usage: scripts/scaling_curve.sh [sf1Dir]
set -euo pipefail
SF1="${1:-/tmp/sf1}"
QUERIES="q35_ocds_flatten q36_ocds_errors q61_connected_components \
q43_media_meta q104_ann_recall q42_xml_flatten q83_bloom_decontam \
q115_phash_dedup q97_best_rep q50_sketch q75_tfidf q112_corr_matrix \
q37_sessionize q111_range_features q103_cohort_retention"
cd "$(dirname "$0")/.."

echo "== derive sf1 =="
sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 $SF1 16" 2>&1 | grep '\[scaleup\]'

echo "== profile sf0.1 =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Prof $QUERIES" 2>&1 | grep '\[prof\]'

echo "== profile sf0.1, broadcast disabled (linear shuffle envelope) =="
SPARK_GRAFT_CONF="spark.sql.autoBroadcastJoinThreshold=-1" \
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Prof $QUERIES" 2>&1 | grep '\[prof\]'

echo "== profile sf1 =="
SPARK_GRAFT_SF_DIR="$SF1" sbt -batch "runMain graft.Prof $QUERIES" 2>&1 | grep '\[prof\]'

#!/bin/bash
# Regenerate PLANS.md — formatted physical plans for the headline queries.
set -e
cd /root/repo
SPARK_GRAFT_SF_DIR=${1:-/root/testdata/sf0.001} \
  sbt -batch "runMain graft.tools.PlanDump" 2>&1 | grep -E "wrote|error" | tail -3

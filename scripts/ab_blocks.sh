#!/bin/bash
# Alternating-block A/B via fresh qbench processes (VERDICT r14 #2).
#
# Usage: scripts/ab_blocks.sh <dirA> <dirB> <blocks> <query> [query...]
# Runs qbench in dirA then dirB, <blocks> times each, alternating
# (A,B,A,B,...) so host drift affects both arms symmetrically; each
# qbench invocation is a fresh Spark session (one warm draw + 3 timed
# draws per query).  Prints each block's JSON line tagged by arm.
set -u
DIRA="$1"; DIRB="$2"; BLOCKS="$3"; shift 3
for b in $(seq 1 "$BLOCKS"); do
  for arm in A B; do
    d="$DIRA"; [ "$arm" = B ] && d="$DIRB"
    out=$(cd "$d" && python scripts/qbench.py "$@" 2>/dev/null | tail -1)
    echo "block=$b arm=$arm dir=$d $out"
  done
done

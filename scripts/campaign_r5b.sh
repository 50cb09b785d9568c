#!/bin/bash
# Round-5 campaign, part B: per-iteration audit + recompute-loop A/B (VERDICT-r4 task #6),
# then the largest-fitting full-f64 CG anchor (task #4, open since round 3).
# Run AFTER part A (one chip).  Exit codes logged per stage (ADVICE-r4 #1).
set -x
cd /root/repo
STATUS=/tmp/r5b_status.txt
: > $STATUS
log_rc() { echo "$1 rc=$2" >> $STATUS; }

# Stage 1: CG iteration audit + classic-vs-recompute A/B at the headline grid.
timeout 4000 python -u scripts/audit_cg_iteration.py --grid 20480 \
  > /tmp/r5b_audit20480.log 2>&1
log_rc audit20480 $?

# Stage 2: same audit at 10240 (cross-check scale).
timeout 3000 python -u scripts/audit_cg_iteration.py --grid 10240 \
  > /tmp/r5b_audit10240.log 2>&1
log_rc audit10240 $?

# Stage 3: largest-fitting full-f64 CG anchor (const-xla, state = 4 f64 fields).
# Descend until one fits; rc recorded PER SIZE so a timeout (124) is distinguishable
# from an OOM — the anchor claim must be auditable from these logs (ADVICE-r4 #1).
F64_DONE=0
for g in 18432 17408 16384 15360 14336; do
  if [ "$F64_DONE" = "0" ]; then
    timeout 3000 python -u -m tpusparse.cli.cg_solver gen:$g --dtype=f64 \
      --mode=stencil5-const-xla --runs=3 --warmup=1 \
      --json=docs/results/cg_${g}_f64_constxla_v5e.json \
      > /tmp/r5b_f64cg_${g}.log 2>&1
    rc=$?
    log_rc f64cg_$g $rc
    [ $rc -eq 0 ] && F64_DONE=$g
  fi
done

echo ALL_STAGES_DONE_R5B
cat $STATUS

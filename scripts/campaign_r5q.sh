#!/bin/bash
# Round-5 part Q (consistency polish): 15360 stencil rows re-measured against the
# round-5 mixed-pattern ceiling (their committed artifacts predate the probe suite and
# lack roofline_fraction_achievable), and the 23040 beyond-ref CG row on the
# recompute loop.
set -x
cd /root/repo
CEIL=docs/results/ceiling_probe_tpu_v5_lite.json
STATUS=/tmp/r5q_status.txt
: > $STATUS
log_rc() { echo "$1 rc=$2" >> $STATUS; }

timeout 3600 python -u -m tpusparse.cli.spmv_bench gen:15360 \
  --mode=stencil5,stencil5-bf16c,stencil5-const \
  --resident-x --ceiling-from=$CEIL --json=docs/results/spmv_15360_v5e.json \
  > /tmp/r5q_flagship15360.log 2>&1
log_rc flagship15360 $?

timeout 2400 python -u -m tpusparse.cli.cg_solver gen:23040 --mode=stencil5-const \
  --runs=3 --warmup=1 --json=docs/results/cg_23040_const_v5e.json \
  > /tmp/r5q_cg23040.log 2>&1
log_rc cg23040 $?

echo ALL_STAGES_DONE_R5Q
cat $STATUS

#!/bin/bash
# Round-5 campaign, part C: re-runs + headline CG artifacts with the recompute loop.
#   1. 2048 fast-modes re-measure (part A's invocation was killed mid-stage while
#      diagnosing a device-claim race — rc=143 in /tmp/r5a_status.txt).
#   2. Fresh 20480/23552 const CG artifacts (the solver now auto-selects the
#      8-words/pt recompute-Ap loop; the artifact records `loop`).
#   3. dia-xla at 15360/20480 (upgrade "oracle role only" absence rows to measured).
set -x
cd /root/repo
CEIL=docs/results/ceiling_probe_tpu_v5_lite.json
STATUS=/tmp/r5c_status.txt
: > $STATUS
log_rc() { echo "$1 rc=$2" >> $STATUS; }

timeout 3600 python -u -m tpusparse.cli.spmv_bench gen:2048 \
  --mode=stencil5,stencil5-bf16c,stencil5-const,stencil5-xla,stencil5-const-xla,dia,dia-xla,csr \
  --resident-x --ceiling-from=$CEIL --json=docs/results/spmv_2048_v5e.json \
  > /tmp/r5c_remeasure_2048.log 2>&1
log_rc remeasure_2048 $?

timeout 3600 python -u -m tpusparse.cli.cg_solver gen:20480 --mode=stencil5-const \
  --runs=10 --warmup=3 --json=docs/results/cg_20480_const_v5e.json \
  > /tmp/r5c_cg20480.log 2>&1
log_rc cg20480 $?

timeout 2400 python -u -m tpusparse.cli.cg_solver gen:23552 --mode=stencil5-const \
  --runs=3 --warmup=1 --json=docs/results/cg_23552_const_v5e.json \
  > /tmp/r5c_cg23552.log 2>&1
log_rc cg23552 $?

timeout 3000 python -u -m tpusparse.cli.spmv_bench gen:15360 --mode=dia-xla \
  --resident-x --ceiling-from=$CEIL --json=docs/results/spmv_15360_v5e.json \
  > /tmp/r5c_diaxla15360.log 2>&1
log_rc diaxla15360 $?
timeout 3600 python -u -m tpusparse.cli.spmv_bench gen:20480 --mode=dia-xla \
  --resident-x --ceiling-from=$CEIL --json=docs/results/spmv_20480_v5e.json \
  > /tmp/r5c_diaxla20480.log 2>&1
log_rc diaxla20480 $?

echo ALL_STAGES_DONE_R5C
cat $STATUS

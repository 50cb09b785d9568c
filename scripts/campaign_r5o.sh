#!/bin/bash
# Round-5 campaign, part O (final): f64 anchor at the safe size first (the 18432 attempt
# spent 50 min in an emulated-f64 remote compile without completing — documented), then
# the remaining artifact stages.
set -x
cd /root/repo
CEIL=docs/results/ceiling_probe_tpu_v5_lite.json
STATUS=/tmp/r5o_status.txt
: > $STATUS
log_rc() { echo "$1 rc=$2" >> $STATUS; }

# f64 CG anchor: 16384 (solve state 4 x 8 B fields = 8.6 GB; ~6 live fields incl.
# in-flight temps = 12.9 GB < 15.75 GB).  Generous timeout: the emulated-f64 while-loop
# compile alone can take tens of minutes on this deployment.
timeout 4200 python -u -m tpusparse.cli.cg_solver gen:16384 --dtype=f64 \
  --mode=stencil5-const-xla --runs=3 --warmup=1 \
  --json=docs/results/cg_16384_f64_constxla_v5e.json \
  > /tmp/r5o_f64cg_16384.log 2>&1
log_rc f64cg_16384 $?

timeout 3600 python -u -m tpusparse.cli.spmv_bench gen:2048 \
  --mode=stencil5,stencil5-bf16c,stencil5-const,stencil5-xla,stencil5-const-xla,dia,dia-xla,csr \
  --resident-x --ceiling-from=$CEIL --json=docs/results/spmv_2048_v5e.json \
  > /tmp/r5o_remeasure_2048.log 2>&1
log_rc remeasure_2048 $?

timeout 3600 python -u -m tpusparse.cli.cg_solver gen:20480 --mode=stencil5-const \
  --runs=10 --warmup=3 --json=docs/results/cg_20480_const_v5e.json \
  > /tmp/r5o_cg20480.log 2>&1
log_rc cg20480 $?
timeout 2400 python -u -m tpusparse.cli.cg_solver gen:23552 --mode=stencil5-const \
  --runs=3 --warmup=1 --json=docs/results/cg_23552_const_v5e.json \
  > /tmp/r5o_cg23552.log 2>&1
log_rc cg23552 $?

timeout 3000 python -u -m tpusparse.cli.spmv_bench gen:10240 --mode=bcoo \
  --runs=3 --warmup=1 --resident-x --ceiling-from=$CEIL \
  --json=docs/results/spmv_10240_v5e.json > /tmp/r5o_bcoo10240.log 2>&1
log_rc bcoo10240 $?
timeout 3000 python -u -m tpusparse.cli.spmv_bench gen:15360 --mode=dia-xla \
  --resident-x --ceiling-from=$CEIL --json=docs/results/spmv_15360_v5e.json \
  > /tmp/r5o_diaxla15360.log 2>&1
log_rc diaxla15360 $?
timeout 3600 python -u -m tpusparse.cli.spmv_bench gen:20480 --mode=dia-xla \
  --resident-x --ceiling-from=$CEIL --json=docs/results/spmv_20480_v5e.json \
  > /tmp/r5o_diaxla20480.log 2>&1
log_rc diaxla20480 $?

# boundary documentation: one bounded re-attempt at 18432 (emulated-f64 compile wall /
# OOM — whichever it is, the rc + log is the evidence)
timeout 1800 python -u -m tpusparse.cli.cg_solver gen:18432 --dtype=f64 \
  --mode=stencil5-const-xla --runs=2 --warmup=1 \
  --json=docs/results/cg_18432_f64_constxla_v5e.json \
  > /tmp/r5o_f64cg_18432.log 2>&1
log_rc f64cg_18432 $?

echo ALL_STAGES_DONE_R5O
cat $STATUS

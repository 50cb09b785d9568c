#!/bin/bash
# Round-5 campaign, part P: f64 anchor via the host-stepped loop.
# The fused f64-emulated while-loop is COMPILE-bound on this deployment above 10240²
# (measured: 18432 spent 50 min and 16384 70 min inside XLA remote compilation without
# finishing — /tmp/r5n_f64cg_18432.log, /tmp/r5o_f64cg_16384.log, rc=124 both).  The
# stepped loop compiles one small program per phase instead, trading per-iteration sync
# overhead (irrelevant against ~80 s f64 solves) for tractable compiles — the same
# de-fuse trade the reference's --timers mode makes.
set -x
cd /root/repo
STATUS=/tmp/r5p_status.txt
: > $STATUS
log_rc() { echo "$1 rc=$2" >> $STATUS; }

# cg@20480 rerun with the payload fix (part O's --runs=10 hit the payload-accumulation
# OOM the fix removes; the recompute loop itself is proven at this size by the audit)
timeout 3600 python -u -m tpusparse.cli.cg_solver gen:20480 --mode=stencil5-const \
  --runs=10 --warmup=3 --json=docs/results/cg_20480_const_v5e.json \
  > /tmp/r5p_cg20480.log 2>&1
log_rc cg20480 $?

# const CG rows at the remaining benchmark sizes (the recompute loop's full
# problem-size story; 10240's program is already compile-cached from the audit)
timeout 2400 python -u -m tpusparse.cli.cg_solver gen:15360 --mode=stencil5-const \
  --runs=10 --warmup=3 --json=docs/results/cg_15360_const_v5e.json \
  > /tmp/r5p_cg15360.log 2>&1
log_rc cg15360 $?
timeout 2400 python -u -m tpusparse.cli.cg_solver gen:10240 --mode=stencil5-const \
  --runs=10 --warmup=3 --json=docs/results/cg_10240_const_v5e.json \
  > /tmp/r5p_cg10240.log 2>&1
log_rc cg10240 $?

timeout 4200 python -u -m tpusparse.cli.cg_solver gen:16384 --dtype=f64 \
  --mode=stencil5-const-xla --timers --runs=3 --warmup=1 \
  --json=docs/results/cg_16384_f64_constxla_stepped_v5e.json \
  > /tmp/r5p_f64cg_16384_stepped.log 2>&1
log_rc f64cg_16384_stepped $?

# fused-loop depth probe one step above the known-good 10240 (bounded)
timeout 2700 python -u -m tpusparse.cli.cg_solver gen:12288 --dtype=f64 \
  --mode=stencil5-const-xla --runs=3 --warmup=1 \
  --json=docs/results/cg_12288_f64_constxla_v5e.json \
  > /tmp/r5p_f64cg_12288.log 2>&1
log_rc f64cg_12288 $?

echo ALL_STAGES_DONE_R5P
cat $STATUS

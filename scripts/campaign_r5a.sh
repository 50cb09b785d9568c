#!/bin/bash
# Round-5 campaign, part A: consistency + table-completion measurements (VERDICT-r4
# tasks #2/#3 + Missing #3 + Weak #5 groundwork).  Stages run sequentially on the one
# real chip; each logs to /tmp/r5a_<stage>.log and records its exit status in
# /tmp/r5a_status.txt (ADVICE-r4: rc=124 timeout vs real failure must be auditable).
set -x
cd /root/repo
CEIL=docs/results/ceiling_probe_tpu_v5_lite.json
STATUS=/tmp/r5a_status.txt
: > $STATUS
log_rc() { echo "$1 rc=$2" >> $STATUS; }

# Stage 0: re-run the EXTENDED ceiling probe suite (adds mix7 = the stencil kernel's
# 6R:1W pattern and read6 = 6 concurrent read streams) — the measured denominator every
# artifact below embeds via --ceiling-from.
timeout 1800 python -u scripts/probe_ceiling.py > /tmp/r5a_probe.log 2>&1
log_rc probe $?

# Stage 1: re-measure the 2048/2560 artifacts under the round-4 fixed chain (fusion
# fence + chain escalation + timing_flags) — VERDICT-r4 task #3: the committed files are
# pre-fix vintage and flagless at >100% of ceiling.  Overwrite is the sanctioned outcome
# (git history preserves the old rows).
for g in 2048 2560; do
  timeout 3000 python -u -m tpusparse.cli.spmv_bench gen:$g \
    --mode=stencil5,stencil5-bf16c,stencil5-const,stencil5-xla,stencil5-const-xla,dia,dia-xla,csr \
    --resident-x --ceiling-from=$CEIL --json=docs/results/spmv_${g}_v5e.json \
    > /tmp/r5a_remeasure_${g}.log 2>&1
  log_rc remeasure_$g $?
  timeout 2400 python -u -m tpusparse.cli.spmv_bench gen:$g --mode=csr-xla,bcoo \
    --runs=3 --warmup=1 --resident-x --ceiling-from=$CEIL \
    --json=docs/results/spmv_${g}_v5e.json > /tmp/r5a_remeasure_slow_${g}.log 2>&1
  log_rc remeasure_slow_$g $?
done

# Stage 2: stencil5-xla@20480 — the one "not measured" stencil cell (VERDICT Missing #3).
timeout 3500 python -u -m tpusparse.cli.spmv_bench gen:20480 --mode=stencil5-xla \
  --resident-x --ceiling-from=$CEIL --json=docs/results/spmv_20480_v5e.json \
  > /tmp/r5a_sxla20480.log 2>&1
log_rc sxla20480 $?

# Stage 3: re-measure the flagship 20480 stencil rows against the NEW mixed-pattern
# ceiling (VERDICT Weak #5: 721 GB/s kernel vs 713 GB/s single-stream read probe).
timeout 3500 python -u -m tpusparse.cli.spmv_bench gen:20480 \
  --mode=stencil5,stencil5-bf16c,stencil5-const \
  --resident-x --ceiling-from=$CEIL --json=docs/results/spmv_20480_v5e.json \
  > /tmp/r5a_flagship20480.log 2>&1
log_rc flagship20480 $?

# Stage 4: csr@20480 via the rot pack (VERDICT task #2: commit 0e834bd claims the
# vals-only operand fits at 8.4 GB — measure it or retract).  Long host pack expected.
timeout 7200 python -u -m tpusparse.cli.spmv_bench gen:20480 --mode=csr \
  --runs=5 --warmup=2 --resident-x --ceiling-from=$CEIL \
  --json=docs/results/spmv_20480_v5e.json > /tmp/r5a_csr20480.log 2>&1
log_rc csr20480 $?

# Stage 5: csr@10240/15360 re-measure with the rot pack.  The committed csr.json rows
# are kept as *-affine.json first when no affine artifact exists yet (ADVICE-r4 #2:
# don't lose the prior pack's hardware rows from the working tree).
[ -f docs/results/spmv_15360_v5e_csr-affine.json ] || \
  cp docs/results/spmv_15360_v5e_csr.json docs/results/spmv_15360_v5e_csr-affine.json
timeout 5400 python -u -m tpusparse.cli.spmv_bench gen:15360 --mode=csr \
  --resident-x --ceiling-from=$CEIL --json=docs/results/spmv_15360_v5e.json \
  > /tmp/r5a_csr15360.log 2>&1
log_rc csr15360 $?
timeout 3600 python -u -m tpusparse.cli.spmv_bench gen:10240 --mode=csr \
  --resident-x --ceiling-from=$CEIL --json=docs/results/spmv_10240_v5e.json \
  > /tmp/r5a_csr10240.log 2>&1
log_rc csr10240 $?

# Stage 6: bcoo@10240 attempt (absence note currently claims "measured through 10240"
# which is false — VERDICT Weak #7; either measure it or the note gets fixed to 4096).
timeout 3000 python -u -m tpusparse.cli.spmv_bench gen:10240 --mode=bcoo \
  --runs=3 --warmup=1 --resident-x --ceiling-from=$CEIL \
  --json=docs/results/spmv_10240_v5e.json > /tmp/r5a_bcoo10240.log 2>&1
log_rc bcoo10240 $?

echo ALL_STAGES_DONE_R5A
cat $STATUS

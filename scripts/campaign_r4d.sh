#!/bin/bash
# Round-4 campaign, part D (this session's runner): the stages parts B/C queued but the
# fresh VM never executed.  Priority order = VERDICT-r3 value per TPU-minute:
#   1. largest-fitting full-f64 CG anchor (task #3 — the only fully open item),
#   2. csr@10240 re-measure with the auto affine+rot pack (+ ceiling probe),
#   3. csr@20480 — newly FITS (rot slots drop the index planes: vals-only ~8.4 GB),
#   4. cheap table gaps (stencil5-xla@20480, bcoo@10240, bcoo@15360 attempt),
#   5. csr@15360 rot re-measure, dia-xla@15360/20480, rot A/B at 10240.
# Stages run sequentially on the one real chip; each logs to /tmp/campaign_<stage>.log.
set -x
cd /root/repo

# Stage E: largest-fitting full-f64 CG anchor (descend until one fits; values-free
# const-xla f64 state = 4 x 8 B fields + an XLA temp field -> expect 18432 or 16384).
for g in 20480 18432 16384 14336; do
  timeout 3000 python -u -m tpusparse.cli.cg_solver gen:$g --dtype=f64 \
    --mode=stencil5-const-xla --runs=5 --warmup=1 \
    --json=docs/results/cg_${g}_f64_constxla_v5e.json \
    > /tmp/campaign_f64cg_${g}.log 2>&1 && break
done

# Stage C1: csr@10240 with the auto-selected affine+rot pack (also the rot kernel's
# first hardware run) + measured ceiling.
timeout 3500 python -u -m tpusparse.cli.spmv_bench gen:10240 --mode=csr \
  --resident-x --ceiling-probe --json=docs/results/spmv_10240_v5e.json \
  > /tmp/campaign_rot10240.log 2>&1

# Stage C3: csr@20480 — the row the table explains as "doesn't fit" is measurable once
# the rot pack drops the index planes.
timeout 7200 python -u -m tpusparse.cli.spmv_bench gen:20480 --mode=csr \
  --resident-x --json=docs/results/spmv_20480_v5e.json \
  > /tmp/campaign_rot20480.log 2>&1

# Cheap table gaps.
timeout 3500 python -u -m tpusparse.cli.spmv_bench gen:20480 --mode=stencil5-xla \
  --resident-x --json=docs/results/spmv_20480_v5e.json \
  > /tmp/campaign_sxla20480.log 2>&1
timeout 3500 python -u -m tpusparse.cli.spmv_bench gen:10240 --mode=bcoo --runs=3 \
  --resident-x --json=docs/results/spmv_10240_v5e.json \
  > /tmp/campaign_bcoo10240.log 2>&1
# bcoo@15360: BCOO nnz=1.18B -> data 4.7 GB + int32 index pair 9.4 GB next to x/y:
# expected OOM.  The attempt IS the measurement (explained row either way).
timeout 2400 python -u -m tpusparse.cli.spmv_bench gen:15360 --mode=bcoo --runs=3 \
  --resident-x --json=docs/results/spmv_15360_v5e.json \
  > /tmp/campaign_bcoo15360.log 2>&1

# Stage C2: csr@15360 rot re-measure (the affine row exists; rot should beat it).
timeout 5400 python -u -m tpusparse.cli.spmv_bench gen:15360 --mode=csr \
  --resident-x --json=docs/results/spmv_15360_v5e.json \
  > /tmp/campaign_rot15360.log 2>&1

# dia-xla at the top sizes (upgrade "oracle role only" rows to measured).
timeout 3500 python -u -m tpusparse.cli.spmv_bench gen:15360 --mode=dia-xla \
  --resident-x --json=docs/results/spmv_15360_v5e.json \
  > /tmp/campaign_diaxla15360.log 2>&1
timeout 3500 python -u -m tpusparse.cli.spmv_bench gen:20480 --mode=dia-xla \
  --resident-x --json=docs/results/spmv_20480_v5e.json \
  > /tmp/campaign_diaxla20480.log 2>&1

# A/B lineage at 10240: ladder vs affine(+rot) under one protocol.
timeout 3500 python -u scripts/gather_ab.py --grid 10240 \
  > /tmp/campaign_gatherab2.log 2>&1

echo ALL_STAGES_DONE_R4D

#!/bin/bash
# Round-4 campaign, part C (after campaign_r4b): the rot-kernel re-measures and the
# remaining table gaps.  Run AFTER campaign_r4b completes (sequential TPU use).
set -x
cd /root/repo

# Rot-kernel re-measures: the affine+rot program replaces the take_along_axis ladder
# with static slices + lane rolls for exact-diagonal slots, and drops their index
# planes from HBM traffic.  csr@20480 newly FITS because of that (vals-only ~8.4 GB).
timeout 3500 python -u -m tpusparse.cli.spmv_bench gen:10240 --mode=csr \
  --resident-x --ceiling-probe --json=docs/results/spmv_10240_v5e.json \
  > /tmp/campaign_rot10240.log 2>&1
timeout 5400 python -u -m tpusparse.cli.spmv_bench gen:15360 --mode=csr \
  --resident-x --ceiling-probe --json=docs/results/spmv_15360_v5e.json \
  > /tmp/campaign_rot15360.log 2>&1
timeout 7200 python -u -m tpusparse.cli.spmv_bench gen:20480 --mode=csr \
  --resident-x --json=docs/results/spmv_20480_v5e.json \
  > /tmp/campaign_rot20480.log 2>&1

# A/B lineage at 10240: ladder vs affine(+rot) under one protocol.
timeout 3500 python -u scripts/gather_ab.py --grid 10240 \
  > /tmp/campaign_gatherab2.log 2>&1

# Remaining measured-or-explained gaps in the format table.
timeout 3500 python -u -m tpusparse.cli.spmv_bench gen:20480 --mode=stencil5-xla \
  --resident-x --json=docs/results/spmv_20480_v5e.json \
  > /tmp/campaign_sxla20480.log 2>&1
timeout 3500 python -u -m tpusparse.cli.spmv_bench gen:15360 --mode=dia-xla \
  --resident-x --json=docs/results/spmv_15360_v5e.json \
  > /tmp/campaign_diaxla15360.log 2>&1
timeout 3500 python -u -m tpusparse.cli.spmv_bench gen:20480 --mode=dia-xla \
  --resident-x --json=docs/results/spmv_20480_v5e.json \
  > /tmp/campaign_diaxla20480.log 2>&1
timeout 3500 python -u -m tpusparse.cli.spmv_bench gen:10240 --mode=bcoo --runs=3 \
  --resident-x --json=docs/results/spmv_10240_v5e.json \
  > /tmp/campaign_bcoo10240.log 2>&1
# bcoo@15360: BCOO nnz=1.18B -> data 4.7 GB + int32 index pair 9.4 GB = 14.1 GB next to
# x/y 1.9 GB: expected OOM.  The attempt is the measurement (explained row either way).
timeout 3500 python -u -m tpusparse.cli.spmv_bench gen:15360 --mode=bcoo --runs=3 \
  --resident-x --json=docs/results/spmv_15360_v5e.json \
  > /tmp/campaign_bcoo15360.log 2>&1

echo ALL_STAGES_DONE_R4C

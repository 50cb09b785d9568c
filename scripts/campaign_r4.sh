#!/bin/bash
# Round-4 measurement campaign (VERDICT r3 tasks 1/2/3/6): sequential TPU stages.
# Each stage logs to /tmp/campaign_<stage>.log; artifacts land in docs/results/.
set -x
cd /root/repo

MODES_ALL=stencil5,stencil5-xla,stencil5-bf16c,stencil5-const,stencil5-const-xla,dia,dia-xla,csr,csr-xla,bcoo

# Stage B: re-measure the small parity grids with the escalated chain protocol +
# on-chip residency flags (the round-3 invalid artifacts).
timeout 3500 python -u -m tpusparse.cli.spmv_bench gen:2048 --mode=$MODES_ALL \
  --resident-x --ceiling-probe --json=docs/results/spmv_2048_v5e.json \
  > /tmp/campaign_2048.log 2>&1
timeout 3500 python -u -m tpusparse.cli.spmv_bench gen:2560 --mode=$MODES_ALL \
  --resident-x --ceiling-probe --json=docs/results/spmv_2560_v5e.json \
  > /tmp/campaign_2560.log 2>&1

# Stage C: generic gather kernel at the table sizes (csr@10240 re-measure with the
# affine windowed variant; csr@15360 fills the table's missing measured row).
timeout 3500 python -u -m tpusparse.cli.spmv_bench gen:10240 --mode=csr \
  --resident-x --ceiling-probe --json=docs/results/spmv_10240_v5e.json \
  > /tmp/campaign_csr10240.log 2>&1
timeout 5400 python -u -m tpusparse.cli.spmv_bench gen:15360 --mode=csr \
  --resident-x --ceiling-probe --json=docs/results/spmv_15360_v5e.json \
  > /tmp/campaign_csr15360.log 2>&1

# Stage D: the f64 SpMV anchor (reference's table is all-f64; BASELINE.md pre-computes
# the expected f64 values-free time).
timeout 3500 python -u -m tpusparse.cli.spmv_bench gen:10240 --dtype=f64 \
  --mode=stencil5-const-xla,stencil5-xla --resident-x \
  --json=docs/results/spmv_10240_f64_v5e.json \
  > /tmp/campaign_f64spmv.log 2>&1

echo ALL_STAGES_DONE

#!/bin/bash
# Round-4 measurement campaign, prioritized (VERDICT r3 tasks 1/2/3/6).
# Stages run sequentially on the one real TPU chip; each logs to /tmp/campaign_<stage>.log.
# Artifacts land in docs/results/ (the table CSV is regenerated from JSONs afterwards).
set -x
cd /root/repo

# Stage C: generic gather kernel at the table sizes.  csr@10240 re-measures with the
# affine windowed variant (auto pack); csr@15360 fills the table's missing measured row
# (operand ~9.4 GB ELL fits the 16 GB chip).
timeout 3500 python -u -m tpusparse.cli.spmv_bench gen:10240 --mode=csr \
  --resident-x --ceiling-probe --json=docs/results/spmv_10240_v5e.json \
  > /tmp/campaign_csr10240.log 2>&1
timeout 5400 python -u -m tpusparse.cli.spmv_bench gen:15360 --mode=csr \
  --resident-x --ceiling-probe --json=docs/results/spmv_15360_v5e.json \
  > /tmp/campaign_csr15360.log 2>&1

# Stage AB: ladder-vs-affine A/B on the same operand, same chained-slope protocol
# (task #6 evidence: is the affine variant the >=2x push or a measured bound?).
timeout 3500 python -u scripts/gather_ab.py --grid 10240 \
  > /tmp/campaign_gatherab.log 2>&1

# Stage D: the f64 SpMV anchor (reference's table is all-f64; BASELINE.md pre-computes
# the expected f64 values-free time).
timeout 3500 python -u -m tpusparse.cli.spmv_bench gen:10240 --dtype=f64 \
  --mode=stencil5-const-xla,stencil5-xla --resident-x \
  --json=docs/results/spmv_10240_f64_v5e.json \
  > /tmp/campaign_f64spmv.log 2>&1

# Stage E: largest-fitting full-f64 CG anchor (descend until one fits; values-free
# const-xla state = 4 fields x 8 B + an XLA temp field).
for g in 20480 18432 16384; do
  timeout 3500 python -u -m tpusparse.cli.cg_solver gen:$g --dtype=f64 \
    --mode=stencil5-const-xla --runs=5 --warmup=1 \
    --json=docs/results/cg_${g}_f64_constxla_v5e.json \
    > /tmp/campaign_f64cg_${g}.log 2>&1 && break
done

# Stage B: re-measure the small parity grids with the fenced-chain protocol +
# validity flags (the round-3 invalid artifacts at 2048/2560).
MODES_ALL=stencil5,stencil5-xla,stencil5-bf16c,stencil5-const,stencil5-const-xla,dia,dia-xla,csr,csr-xla,bcoo
timeout 5400 python -u -m tpusparse.cli.spmv_bench gen:2048 --mode=$MODES_ALL \
  --resident-x --ceiling-probe --json=docs/results/spmv_2048_v5e.json \
  > /tmp/campaign_2048.log 2>&1
timeout 5400 python -u -m tpusparse.cli.spmv_bench gen:2560 --mode=$MODES_ALL \
  --resident-x --ceiling-probe --json=docs/results/spmv_2560_v5e.json \
  > /tmp/campaign_2560.log 2>&1

echo ALL_STAGES_DONE

#!/bin/bash
# Round-5 master campaign (replaces the killed A/B/C chain after the rot-probe fix):
#   0. fail-fast: recompute-loop kernels compile + converge on real TPU at 4096
#   1. CG iteration audit + classic-vs-recompute A/B at 20480 (headline decision)
#   2. csr@10240 with the FIXED rot pack (cheapest validation of the rot kernel at scale)
#   3. audit at 10240 (cross-check)
#   4. csr@20480 (vals-only rot operand, 8.4 GB — VERDICT-r4 task #2)
#   5. csr@15360 rot
#   6. largest-fitting full-f64 CG anchor (descend; rc logged per size — ADVICE-r4 #1)
#   7. 2048 fast-modes re-measure (part A's was killed mid-stage)
#   8. fresh 20480/23552 const CG artifacts (recorded loop)
#   9. bcoo@10240 attempt, dia-xla@15360/20480 (optional table upgrades)
# ONE process at a time on the one chip; each stage logs rc to /tmp/r5m_status.txt.
set -x
cd /root/repo
CEIL=docs/results/ceiling_probe_tpu_v5_lite.json
STATUS=/tmp/r5m_status.txt
: > $STATUS
log_rc() { echo "$1 rc=$2" >> $STATUS; }

timeout 1200 python -u -m tpusparse.cli.cg_solver gen:4096 --mode=stencil5-const \
  --loop=recompute --runs=3 --warmup=1 > /tmp/r5m_failfast.log 2>&1
log_rc failfast_recompute4096 $?

timeout 4000 python -u scripts/audit_cg_iteration.py --grid 20480 \
  > /tmp/r5m_audit20480.log 2>&1
log_rc audit20480 $?

timeout 3600 python -u -m tpusparse.cli.spmv_bench gen:10240 --mode=csr \
  --resident-x --ceiling-from=$CEIL --json=docs/results/spmv_10240_v5e.json \
  > /tmp/r5m_csr10240.log 2>&1
log_rc csr10240 $?

timeout 3000 python -u scripts/audit_cg_iteration.py --grid 10240 \
  > /tmp/r5m_audit10240.log 2>&1
log_rc audit10240 $?

timeout 7200 python -u -m tpusparse.cli.spmv_bench gen:20480 --mode=csr \
  --runs=5 --warmup=2 --resident-x --ceiling-from=$CEIL \
  --json=docs/results/spmv_20480_v5e.json > /tmp/r5m_csr20480.log 2>&1
log_rc csr20480 $?

timeout 5400 python -u -m tpusparse.cli.spmv_bench gen:15360 --mode=csr \
  --resident-x --ceiling-from=$CEIL --json=docs/results/spmv_15360_v5e.json \
  > /tmp/r5m_csr15360.log 2>&1
log_rc csr15360 $?

F64_DONE=0
for g in 18432 17408 16384 15360 14336; do
  if [ "$F64_DONE" = "0" ]; then
    timeout 3000 python -u -m tpusparse.cli.cg_solver gen:$g --dtype=f64 \
      --mode=stencil5-const-xla --runs=3 --warmup=1 \
      --json=docs/results/cg_${g}_f64_constxla_v5e.json \
      > /tmp/r5m_f64cg_${g}.log 2>&1
    rc=$?
    log_rc f64cg_$g $rc
    [ $rc -eq 0 ] && F64_DONE=$g
  fi
done

timeout 3600 python -u -m tpusparse.cli.spmv_bench gen:2048 \
  --mode=stencil5,stencil5-bf16c,stencil5-const,stencil5-xla,stencil5-const-xla,dia,dia-xla,csr \
  --resident-x --ceiling-from=$CEIL --json=docs/results/spmv_2048_v5e.json \
  > /tmp/r5m_remeasure_2048.log 2>&1
log_rc remeasure_2048 $?

timeout 3600 python -u -m tpusparse.cli.cg_solver gen:20480 --mode=stencil5-const \
  --runs=10 --warmup=3 --json=docs/results/cg_20480_const_v5e.json \
  > /tmp/r5m_cg20480.log 2>&1
log_rc cg20480 $?
timeout 2400 python -u -m tpusparse.cli.cg_solver gen:23552 --mode=stencil5-const \
  --runs=3 --warmup=1 --json=docs/results/cg_23552_const_v5e.json \
  > /tmp/r5m_cg23552.log 2>&1
log_rc cg23552 $?

timeout 3000 python -u -m tpusparse.cli.spmv_bench gen:10240 --mode=bcoo \
  --runs=3 --warmup=1 --resident-x --ceiling-from=$CEIL \
  --json=docs/results/spmv_10240_v5e.json > /tmp/r5m_bcoo10240.log 2>&1
log_rc bcoo10240 $?
timeout 3000 python -u -m tpusparse.cli.spmv_bench gen:15360 --mode=dia-xla \
  --resident-x --ceiling-from=$CEIL --json=docs/results/spmv_15360_v5e.json \
  > /tmp/r5m_diaxla15360.log 2>&1
log_rc diaxla15360 $?
timeout 3600 python -u -m tpusparse.cli.spmv_bench gen:20480 --mode=dia-xla \
  --resident-x --ceiling-from=$CEIL --json=docs/results/spmv_20480_v5e.json \
  > /tmp/r5m_diaxla20480.log 2>&1
log_rc diaxla20480 $?

echo ALL_STAGES_DONE_R5M
cat $STATUS

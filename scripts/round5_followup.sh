#!/bin/bash
# Round-5 follow-up TPU chain (run after round5_campaign.sh):
#   - [[288,12,18]] circuit study with the kernel-4 VMEM fix (bf16 default)
#   - [[288]] f32 check points (bf16 cross-dtype validation at this scale)
#   - bf16-MXU fused-kernel throughput (f32 vs bf16, fixed + early-exit)
#   - bf16-MXU LER validation vs the reference archives (bp+osd0, bp-only)
#   - [[144]] factored-OSD spot check (kernel-4 panel narrowed 64 -> 16)
#   - driver-contract bench.py as the final (pool-warming) step
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
stage="${1:-all}"

if [ "$stage" = 288 ] || [ "$stage" = all ]; then
  python -m qldpc_tpu.experiments.cli run complete-bposd \
    --codes "[[288, 12, 18]]" --trials 10000 \
    --error-rates 0.001 0.0015 0.002 0.003 \
    --out results/circuit_ler_r5_288 2>&1 | grep -v WARNING
fi

if [ "$stage" = 288f32 ] || [ "$stage" = all ]; then
  python -m qldpc_tpu.experiments.cli run complete-bposd \
    --codes "[[288, 12, 18]]" --trials 10000 \
    --error-rates 0.0015 0.003 --set bp_stream_dtype=float32 \
    --out results/circuit_f32_val_288 2>&1 | grep -v WARNING
fi

if [ "$stage" = mxu ] || [ "$stage" = all ]; then
  python scripts/bench_bf16_mxu.py --out results/bench_bf16_mxu.json \
    2>&1 | grep -v WARNING
fi

if [ "$stage" = mxuval ] || [ "$stage" = all ]; then
  # LER parity of the bf16-MXU kernel vs the reference archives: the
  # deterministic BP+OSD-0 workload (rel=0) on all five codes plus the
  # convergence-sensitive bp-only workload
  python scripts/validate_baseline.py --trials 10000 \
    --workloads bp+osd0 bp-only --mm-dtype bfloat16 \
    --out results/validation_r5_bf16mxu 2>&1 | grep -v WARNING
fi

if [ "$stage" = osd144 ] || [ "$stage" = all ]; then
  python scripts/bench_circuit144.py --skip-bp --skip-e2e --skip-xla-osd \
    --batches 512 --check-chunks 8 \
    --out results/bench_circuit144_r5_osd.json 2>&1 | grep -v WARNING | tail -5
fi

if [ "$stage" = bench ] || [ "$stage" = all ]; then
  python bench.py 2> results/bench_r5b_phases.log
fi

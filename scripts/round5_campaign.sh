#!/bin/bash
# Round-5 TPU measurement + study campaign (one v5e chip, runs serialized
# back-to-back: the remote pool's claim handshake is warm across
# consecutive processes — 0.3 s vs 44-400 s cold, see bench.py docstring).
# Stages:
#   bash scripts/round5_campaign.sh bench   # driver-contract bench (warms pool+cache)
#   bash scripts/round5_campaign.sh 288     # [[288,12,18]] circuit study, 10k trials
#   bash scripts/round5_campaign.sh 288f32  # [[288]] f32 check points (bf16 validation)
#   bash scripts/round5_campaign.sh bf16x   # bf16 LER validation on [[90]]/[[108]]
#   bash scripts/round5_campaign.sh bpiter  # BP-iteration study (10k)
#   bash scripts/round5_campaign.sh perf    # batch anomaly + OSD-e wide
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
stage="${1:-all}"

if [ "$stage" = bench ] || [ "$stage" = all ]; then
  python bench.py 2> results/bench_r5_phases.log
fi

if [ "$stage" = 288 ] || [ "$stage" = all ]; then
  # VERDICT r4 item 2: the [[288,12,18]] circuit-level study (the last
  # TBD row of docs/circuit_ler.md; reference constructs all five BB
  # codes — studies/studyComplete.py:15-55). Default dtype = the
  # complete-bposd preset's bf16 streams.
  python -m qldpc_tpu.experiments.cli run complete-bposd \
    --codes "[[288, 12, 18]]" --trials 10000 \
    --error-rates 0.001 0.0015 0.002 0.003 \
    --out results/circuit_ler_r5_288 2>&1 | grep -v WARNING
fi

if [ "$stage" = 288f32 ] || [ "$stage" = all ]; then
  # f32 realization of two [[288]] points so the bf16 default's LER is
  # cross-dtype validated at this scale too (VERDICT r4 item 7)
  python -m qldpc_tpu.experiments.cli run complete-bposd \
    --codes "[[288, 12, 18]]" --trials 10000 \
    --error-rates 0.0015 0.003 --set bp_stream_dtype=float32 \
    --out results/circuit_f32_val_288 2>&1 | grep -v WARNING
fi

if [ "$stage" = bf16x ] || [ "$stage" = all ]; then
  # bf16-vs-f32 LER check on the two codes whose published curves are
  # f32-only; compares against results/circuit_ler_r4_{90,108} at the
  # shared grid points (VERDICT r4 item 7)
  python -m qldpc_tpu.experiments.cli run complete-bposd \
    --codes "[[90, 8, 10]]" "[[108, 8, 10]]" --trials 10000 \
    --error-rates 0.001 0.002 \
    --out results/circuit_bf16_val_r5 2>&1 | grep -v WARNING
fi

if [ "$stage" = bpiter ] || [ "$stage" = all ]; then
  # VERDICT r4 item 8: the reference's BP_per_Iteration.py workload
  # (its archive was never committed, so this is a self-realization)
  python -m qldpc_tpu.experiments.cli run bp-iteration \
    --codes "[[72, 12, 6]]" "[[144, 12, 12]]" --trials 10000 \
    --out results/bp_iteration_r5 2>&1 | grep -v WARNING
fi

if [ "$stage" = perf ] || [ "$stage" = all ]; then
  # VERDICT r4 items 3+5: the B=2048/4096 per-sample anomaly profile and
  # the OSD-e combined b/rank-exit measurement
  python scripts/profile_dem_batch.py --batches 1024,2048,4096 \
    --out results/dem_batch_profile.json 2>&1 | grep -v WARNING
  python scripts/bench_osde_wide.py 2>&1 | grep -v WARNING | tail -20
fi

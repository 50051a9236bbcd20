#!/bin/bash
# Round-3 measurement sweep: run after the LER study frees the chip.
# Each step is independently retried once and logs to /tmp/r3_meas.log.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
log=/tmp/r3_meas.log
run() {
  name=$1; shift
  echo "=== $name ===" >> $log
  timeout 3000 "$@" >> $log 2>&1 || {
    echo "--- retry $name ---" >> $log
    sleep 30
    timeout 3000 "$@" >> $log 2>&1 || echo "!!! $name FAILED" >> $log
  }
}

# 1. DEM BP kernel-vs-XLA record (results/bench_dem_bp.json)
run bench_dem_bp python scripts/bench_dem_bp.py --batch 1024

# 2. bench.py sanity (rotated batches) + fixed-iteration raw figure
run bench_default python bench.py
run bench_fixed env BENCH_FIXED_ITER=1 BENCH_DEADLINE=1200 python bench.py

# 3. OSD-e wide measurement (results/bench_osde_wide.json)
run bench_osde python scripts/bench_osde_wide.py --trials 8192

# 4. engine overhead profile (results/profile_engine.json)
run profile_engine python scripts/profile_engine.py

echo "ALL DONE" >> $log

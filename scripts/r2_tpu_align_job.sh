#!/bin/bash
# Round-2 TPU job: fused-align correctness check then off/on benchmark.
# One TPU process at a time (CLAUDE.md); this wrapper serializes them.
set -u
cd /root/repo
echo "=== check_fused_tpu.py ==="
timeout 1800 python scripts/check_fused_tpu.py 2>&1
echo "=== bench_align_tpu.py both ==="
timeout 2400 python scripts/bench_align_tpu.py both 2>&1
echo "=== done rc=$? ==="

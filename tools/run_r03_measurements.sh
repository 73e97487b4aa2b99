#!/bin/bash
# Round-3 measurement sweep: run when the TPU tunnel is back.
# Warms the persistent compile cache (so the driver's own bench.py run
# replays cached programs) and records the full ladder.
set -x
cd /root/repo

# 1. headline + parity + exact tracer (also warms the driver-run programs)
timeout 1800 python bench.py 2>bench_r03.stderr | tee /tmp/bench_r03.json

# 2. exact-tracer variant timings (VERDICT r2 task 4 evidence)
timeout 1800 python tools/time_exact.py 960x540 8 2>&1 | tee /tmp/time_exact_960.txt
timeout 1800 python tools/time_exact.py 1920x1080 5 2>&1 | tee /tmp/time_exact_1080.txt

# 3. the BASELINE config ladder -> docs/LADDER_r03.jsonl
timeout 5400 python benchmarks.py 2>/tmp/ladder_r03.stderr | tee docs/LADDER_r03.jsonl

echo "done; inspect /tmp/bench_r03.json, /tmp/time_exact_*.txt, docs/LADDER_r03.jsonl"

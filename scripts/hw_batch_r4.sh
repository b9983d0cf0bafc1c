#!/bin/bash
# Round-4 hardware batch — run when the axon tunnel recovers.
# Each step is independently timeout-bounded and logs to /tmp/hw_r4_*.log.
cd /root/repo || exit 1
run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 3600 "$@" >"/tmp/hw_r4_${name}.log" 2>&1
  echo "=== $name exit=$? ==="
}

# 1. Full-stack smoke (fold + high-K code) — already passed once
#    (11:29), re-run cheap to confirm recovery.
run smoke python scripts/tpu_smoke.py

# 2. Headline bench with the fold (the round-4 perf measurement):
#    interleaved all-mode table + live/lazy overheads + slopes.
run bench python bench.py

# 3. High-K probes: the DIA D=65 family (fixed assert), K=255 secded
#    with the fold (the pre-fold compile failed HTTP 500), K=511.
run dense32 python scripts/tpu_bench.py --blocks 10 --targets jnp,pallas \
    --modes none,secded --layouts denseband:32
run dense127s python scripts/tpu_bench.py --blocks 10 --targets pallas \
    --modes secded --layouts denseband:127
run dense255 python scripts/tpu_bench.py --blocks 10 --targets pallas \
    --modes none,secded --layouts denseband:255

# 4. Adversarial zoo vs the compiled reference binary (routing +
#    speedups + cost-model check).
run zoo python scripts/zoo_bench.py

# 5. Interleaved slope sweep refresh (fold changes the live secded
#    slope — the headline detection-overhead numbers).
run slope python scripts/tpu_slope.py --record

# 6. Wideband/bandsplit/fatsplit bench rows with the fold.
run wideband python scripts/tpu_bench.py --blocks 10 --targets pallas \
    --modes none,secded --layouts "wideband:2500,bandsplit,fatsplit"

# 7. Pipelined-solver hardware evidence (r3 verdict weakness 5):
#    standard-vs-pipelined cost + the ABFT-restart path with a fault.
run pipelined python scripts/pipelined_probe.py

echo "ALL DONE"

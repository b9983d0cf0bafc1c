#!/bin/bash
# Hardware validation batch for round-3 late additions. Run from /root/repo.
# Ordered safest/highest-value first: a crashed worker can take the axon
# tunnel down 30+ min, so proven kernels run before new untested code.
cd /root/repo
exec >> /tmp/hw_batch.log 2>&1
set -x
date

# 1. Headline bench on proven kernels — the most valuable artifact.
timeout 1800 python bench.py
date

# 2. Smoke on the PROVEN configs (dia includes the new jacobi + lazy8
#    steps at the end — by then the headline is already captured).
timeout 3000 python scripts/tpu_smoke.py dia ellb ellb-perm split
date

# 3. Lazy schedule sweep: secded + none at CI=8 (dia + ell).
timeout 1800 python scripts/tpu_bench.py --layouts dia,ell --modes none,secded --targets pallas --check-interval 8
date

# 4. NEW code: wideband + bandsplit smoke (absolute scan, band-split).
timeout 3000 python scripts/tpu_smoke.py wideband bandsplit
date

# 5. Re-run the crashed wideband sec7..secded + bandsplit bench rows.
timeout 3000 python scripts/tpu_bench.py --layouts wideband --modes none,sed,sec7,sec8,secded,constraints
date
timeout 3000 python scripts/tpu_bench.py --layouts bandsplit --modes none,sed,sec7,sec8,secded,constraints
date

# 6. A/B: absolute scan forced on banded ELL (vs the unrolled shuffle rows
#    already in BENCH_TPU.jsonl).
ABFT_FUSED_ABS_SCAN=1 timeout 1800 python scripts/tpu_bench.py --layouts ell --modes none,secded --targets pallas --out /root/repo/BENCH_ABS_SCAN.jsonl
date
echo "HW BATCH DONE"

# 7. Streaming-tier lazy at -b 100 (8.19M rows, beyond the resident
#    envelope): HBM-snapshot lazy vs live on dia.
timeout 2400 python scripts/tpu_bench.py --blocks 100 --layouts dia --modes none,secded --targets pallas --check-interval 8
date
echo "HW BATCH DONE (incl step 7)"

# 8. NEWEST routing coverage: 3-D stencil (DIA megakernel, big offsets)
#    and the fat-tail band split (kernel main + ~50% flat tail); also
#    re-runs dia to cover the new --checkpoint smoke step.
timeout 3000 python scripts/tpu_smoke.py poisson3d fatsplit dia
date
echo "HW BATCH DONE (incl step 8)"

# 9. Mosaic-validate the big-offset DIA megakernel mode (dynamic
#    8-aligned slices of the resident p; env-gated until this passes —
#    on success the smoke writes the auto-enable marker).
ABFT_FUSED_BIG_OFFSET=1 timeout 2400 python scripts/tpu_smoke.py bigoffset
date
echo "HW BATCH DONE (incl step 9)"

# 10. Bench rows for the new routing: 3-D stencil DIA megakernel and
#     the fat-tail band split (calibration input for the cut model).
timeout 3000 python scripts/tpu_bench.py --layouts poisson3d,fatsplit --modes none,secded
date
echo "HW BATCH DONE (incl step 10)"

#!/bin/bash
# Round-5 chip queue, part 2: clean-artifact re-runs after the sizing fix.
cd /root/repo || exit 1
mkdir -p logs_r5
echo "[queue2] start $(date)"

# B. Full validation re-run (curve + bake) at the tight initial caps
#    (R=16 probe-headroom sizing, commit 48c3fff): targets overflow 0 on
#    EVERY row with zero resizes, restoring ~90-100 it/s steady. Replaces
#    the run-A top-level artifact coherently (same protocol, one run).
VALIDATION_ROUND=5 SCALE_W=0.1 LAPL_W=1e5 \
  DENSIFY=3000 PRUNE=2000 RESET=60000 \
  BAKE=150 BAKE_POSES=8 \
  timeout 14400 python scripts/validate_tpu_training.py 65 100 \
  > logs_r5/08_validate_b.log 2>&1
echo "[queue2] 08_validate_b rc=$? $(date)"

# C. Longer grow-to-cap: 350 epochs x 300 frames (105k steps, 350 densify
#    events) so the population actually approaches the 200,704 cap
#    (the 135-epoch run reached 117,731).
VALIDATION_ROUND=5 VALIDATION_SECTION=grow_to_cap \
  CAP=200704 TEX=256 INCREASE=1000 \
  SCALE_W=0.1 LAPL_W=1e5 DENSIFY=300 PRUNE=200 RESET=60000 \
  timeout 14400 python scripts/validate_tpu_training.py 350 300 \
  > logs_r5/09_growcap_b.log 2>&1
echo "[queue2] 09_growcap_b rc=$? $(date)"

echo "[queue2] done $(date)"

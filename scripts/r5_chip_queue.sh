#!/bin/bash
# Round-5 chip evidence queue (VERDICT r5 items 1-7) — strictly serialized:
# the environment has ONE real TPU chip behind the axon tunnel, and two JAX
# processes cannot share it. Each job logs to logs_r5/ and failures do not
# stop the queue (every artifact is independent evidence).
cd /root/repo || exit 1
mkdir -p logs_r5
echo "[queue] start $(date)"

# 1. Headline fidelity curve at reference recipe + cadence, autosized caps
#    (item 3: target overflow=0) + full-budget bake gate with convergence
#    curve (item 2: BAKE=150 steps-matched to the reference's 5-epoch/~15k
#    step convergence budget, commit 064bca5 note).
VALIDATION_ROUND=5 SCALE_W=0.1 LAPL_W=1e5 \
  DENSIFY=3000 PRUNE=2000 RESET=60000 \
  BAKE=150 BAKE_POSES=8 \
  timeout 14400 python scripts/validate_tpu_training.py 65 100 \
  > logs_r5/01_validate.log 2>&1
echo "[queue] 01_validate rc=$? $(date)"

# 2. Completion pipeline at production shape (item 1): 512^2, 8 views,
#    200+200 PTI, cap 70k — the reference full-head workflow as one run.
BENCH_ROUND=05 timeout 14400 python scripts/completion_e2e.py \
  > logs_r5/02_completion.log 2>&1
echo "[queue] 02_completion rc=$? $(date)"

# 3. Grow-to-cap long horizon (item 7): 65k -> ~200k cap through 135
#    densify events (increase_num=1000, the reference count) at 10x
#    compressed cadence (densify 300 vs 3000, prune 200 vs 2000 — the
#    event-to-step RATIO of the reference preserved at a runnable length).
VALIDATION_ROUND=5 VALIDATION_SECTION=grow_to_cap \
  CAP=200704 TEX=256 INCREASE=1000 \
  SCALE_W=0.1 LAPL_W=1e5 DENSIFY=300 PRUNE=200 RESET=60000 \
  timeout 14400 python scripts/validate_tpu_training.py 135 300 \
  > logs_r5/03_growcap.log 2>&1
echo "[queue] 03_growcap rc=$? $(date)"

# 4. Per-phase device profile (item 4) at the bench config (VGG loss +
#    maintenance live) -> docs/artifacts/profile_phases.json, inlined by
#    bench.py into BENCH_r05.json.
PROF_VGG=1 PROF_MAINT=1 PROF_BINNING=twotier \
  timeout 3600 python scripts/profile_train_step.py 30 \
  > logs_r5/04_profile.log 2>&1
echo "[queue] 04_profile rc=$? $(date)"

# 5. Full sweep refresh on post-r4 code (item 5).
BENCH_ROUND=05 timeout 14400 python scripts/bench_sweep.py \
  > logs_r5/05_sweep.log 2>&1
echo "[queue] 05_sweep rc=$? $(date)"

# 6. Mosaic 1x1 re-record with the jitted splat-sharded wrapper (item 6).
MULTICHIP_ROUND=05 timeout 7200 python scripts/mosaic_compile_1x1.py \
  > logs_r5/06_mosaic.log 2>&1
echo "[queue] 06_mosaic rc=$? $(date)"

# 7. bench.py once on the chip: verifies the new mfu block end-to-end
#    (the driver runs it again at round end for BENCH_r05.json).
timeout 7200 python bench.py > logs_r5/07_bench.log 2>&1
echo "[queue] 07_bench rc=$? $(date)"

echo "[queue] done $(date)"

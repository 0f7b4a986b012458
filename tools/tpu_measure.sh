#!/bin/bash
# Full TPU measurement pass — run when the axon relay is reachable.
# Serialized (single-core host: NEVER run pytest or another heavy job
# concurrently; measured ~20% fps loss under load). Each section appends
# its own log under $OUT. Round-4 goals (VERDICT r3 #1/#2):
#   1. re-land the driver-verifiable headline (bench.py default run)
#   2. land the four pending rows: top-only streaming (printed by every
#      run), int8 (BENCH_QUANT), AOT artifact (BENCH_EXPORT), train-step
#      donation effect (BENCH_TRAIN)
# First compile of a NEW program on the relay is 7-21 min (server-side
# compile cache); identical programs recompile in ~20 s. Budget one slow
# compile per section.
set -x
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/r4_measure}
mkdir -p "$OUT"

# 0. relay probe (bench.py does its own, but fail fast here)
timeout 150 python -c 'import jax,sys; sys.exit(0 if any(d.platform!="cpu" for d in jax.devices()) else 3)' \
  || { echo "relay down"; exit 3; }

# 1. official bench: headline + streaming + quantized + top-only rows
timeout 4000 python bench.py > "$OUT/bench.json" 2> "$OUT/bench.log"
echo "bench exit=$?"

# 2. int8 serving (model.quant=int8; v5e int8 peak 2x bf16 — expect a win
#    only on the ~0.9 ms/frame trunk-conv slice)
BENCH_QUANT=1 timeout 4000 python bench.py > "$OUT/quant.json" 2> "$OUT/quant.log"
echo "quant exit=$?"

# 3. train-step throughput (donation + remat effect vs 264.8 ms/step r3)
BENCH_TRAIN=1 BENCH_TRAIN_BATCH=8 timeout 4000 python bench.py \
  > "$OUT/train.json" 2> "$OUT/train.log"
echo "train exit=$?"

# 4. AOT artifact throughput (must be ~1.0x the in-process jit number)
BENCH_EXPORT=1 timeout 4000 python bench.py > "$OUT/export.json" 2> "$OUT/export.log"
echo "export exit=$?"

# 5. sharded serving fan-out (degenerates to the headline on 1 chip)
BENCH_MESH=1 timeout 4000 python bench.py > "$OUT/mesh.json" 2> "$OUT/mesh.log"
echo "mesh exit=$?"

grep -h e2e "$OUT"/*.log | sort -u

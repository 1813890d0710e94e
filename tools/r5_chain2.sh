#!/bin/bash
# Round-5 LAION chain, corrected continuation (replaces r5_laion_retrain.sh's
# leg 2, which forgot --model-save-path and the r3 run's sampling/dispatch
# flags). Leg 1 (vae_laion 100ep, PID passed as $1) is already running; this
# script waits for it, exports its npz, then runs the 1000-epoch
# text-conditional recipe exactly as the r3 published run
# (checkpoints/laion_diffusion_1000ep.json config) and exports that too.
set -u
cd /root/repo
VAE_PID=${1:?usage: r5_chain2.sh <vae_pid>}
LOG=runs/r5/chain2.log
echo "=== chain2 start $(date), waiting on vae pid $VAE_PID ===" >> "$LOG"

while kill -0 "$VAE_PID" 2>/dev/null; do sleep 30; done
echo "=== vae leg done $(date) ===" >> "$LOG"

python tools/export_weights.py --checkpoint checkpoints/vae_laion_best \
  >> "$LOG" 2>&1
echo "vae export rc=$? $(date)" >> "$LOG"

echo "=== leg 2: laion diffusion 1000ep $(date) ===" >> "$LOG"
python conditional_diffusion_laion.py --num-epochs 1000 \
  --out-dir runs/laion_diffusion_r5_1000ep \
  --model-save-path checkpoints/laion_diffusion_1000ep \
  --sample-every-epochs 100 --steps-per-dispatch 10 \
  >> runs/r5/laion_diffusion.log 2>&1
echo "laion_diffusion rc=$? $(date)" >> "$LOG"

python tools/export_weights.py --checkpoint checkpoints/laion_diffusion_1000ep \
  >> "$LOG" 2>&1
echo "diffusion export rc=$? $(date)" >> "$LOG"

echo "=== chain2 done $(date) ===" >> "$LOG"
touch /tmp/r5_chain2_done

#!/bin/bash
# Round-5 post-diffusion chain (VERDICT r4 next #2 + #3, diffusion half):
# waits for the running 1000-epoch LAION diffusion retrain (PID $1), then
#   1. exports checkpoints/laion_diffusion_1000ep.npz (CPU-only)
#   2. cold-start proof: hides the Orbax dir and serves the 4 sample prompts
#      plus a 256-PNG dump from the npz alone (README.md's own cold-start
#      command, the reference's distributable-checkpoint flow,
#      latent_diffusion.py:422-429)
#   3. scores the dump with tools/fid_eval_laion.py (trains + caches the
#      rgb256 feature net, emits floor/ceiling calibration + samples rows)
# Leaves /tmp/r5_after_diffusion_done when finished. VAE leg + bench are
# launched separately after inspection.
set -u
cd /root/repo
PID=${1:?usage: r5_after_diffusion.sh <diffusion_pid>}
LOG=runs/r5/after_diffusion.log
echo "=== after_diffusion start $(date), waiting on pid $PID ===" >> "$LOG"
while kill -0 "$PID" 2>/dev/null; do sleep 30; done
echo "=== diffusion leg done $(date) ===" >> "$LOG"
tail -3 runs/r5/laion_diffusion.log >> "$LOG"

python tools/export_weights.py --checkpoint checkpoints/laion_diffusion_1000ep \
  >> "$LOG" 2>&1
echo "export rc=$? $(date)" >> "$LOG"

# Cold-start proof: serving must work from the committed artifacts alone
# (npz + JSON sidecar), exactly what a fresh clone gets.
mv checkpoints/laion_diffusion_1000ep /tmp/orbax_laion_diff_hidden
mkdir -p runs/r5/fid_samples
python generate_laion.py --checkpoint checkpoints/laion_diffusion_1000ep \
  --out static/laion_generated_1000ep.png \
  --dump-dir runs/r5/fid_samples --repeat 64 --seed 0 >> "$LOG" 2>&1
echo "generate rc=$? $(date)" >> "$LOG"
mv /tmp/orbax_laion_diff_hidden checkpoints/laion_diffusion_1000ep

python tools/fid_eval_laion.py --samples-dir runs/r5/fid_samples \
  --json-out runs/r5/fid_laion.jsonl >> "$LOG" 2>&1
echo "fid rc=$? $(date)" >> "$LOG"

echo "=== after_diffusion done $(date) ===" >> "$LOG"
touch /tmp/r5_after_diffusion_done

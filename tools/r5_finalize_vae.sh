#!/bin/bash
# Round-5 VAE-leg finalization: stop the conv-VAE trainer gracefully
# (SIGTERM, never SIGKILL mid-TPU-call — BestKeeper has already persisted
# the best-val checkpoint), export the committed npz, and emit the full
# LAION FID table (calibration + vae_recon + vae_prior + samples rows).
#
# usage: r5_finalize_vae.sh <vae_pid | ->   ('-' = no trainer running)
set -u
cd /root/repo
PID=${1:?usage: r5_finalize_vae.sh <vae_pid | ->}
LOG=runs/r5/finalize_vae.log
echo "=== finalize start $(date) ===" >> "$LOG"

if [ "$PID" != "-" ] && kill -0 "$PID" 2>/dev/null; then
  kill -TERM "$PID"
  for _ in $(seq 1 60); do
    kill -0 "$PID" 2>/dev/null || break
    sleep 2
  done
  echo "trainer stopped $(date)" >> "$LOG"
  sleep 5
fi

python tools/export_weights.py --checkpoint checkpoints/vae_laion_best \
  >> "$LOG" 2>&1
echo "vae export rc=$? $(date)" >> "$LOG"

python tools/fid_eval_laion.py --samples-dir runs/r5/fid_samples \
  --json-out runs/r5/fid_laion.jsonl >> "$LOG" 2>&1
echo "fid rc=$? $(date)" >> "$LOG"

echo "=== finalize done $(date) ===" >> "$LOG"
touch /tmp/r5_finalize_done

#!/bin/bash
# Round-5 LAION pair retrain (VERDICT r4 next #2): the Orbax checkpoint dirs
# die with sessions, so the two most expensive artifacts are retrained at
# their exact published recipes and exported to the committed npz format.
# Sequenced in ONE background chain so the chip never idles between legs.
#
# Leg 1: conv beta-VAE 3x256^2, latent 128, batch 4, 100 epochs
#        (reference vae_laion.py:25-43) -> checkpoints/vae_laion_best.npz
# Leg 2: text-conditional latent diffusion, 1000 epochs, batch 8
#        (reference conditional_diffusion_laion.py:632)
#        -> checkpoints/laion_diffusion_1000ep.npz
#
# Both legs resume from their best checkpoint if killed and rerun.
set -u
cd /root/repo
mkdir -p runs/r5
echo "=== chain start $(date) ===" >> runs/r5/chain.log

echo "=== leg 1: vae_laion 100ep $(date) ===" >> runs/r5/chain.log
python vae_laion.py --epochs 100 --out-dir runs/vae_laion_r5_full \
  --resume true >> runs/r5/vae_laion.log 2>&1
echo "vae_laion rc=$? $(date)" >> runs/r5/chain.log
python tools/export_weights.py --checkpoint checkpoints/vae_laion_best \
  >> runs/r5/chain.log 2>&1

echo "=== leg 2: laion diffusion 1000ep $(date) ===" >> runs/r5/chain.log
python conditional_diffusion_laion.py --num-epochs 1000 \
  --out-dir runs/laion_diffusion_r5_1000ep \
  >> runs/r5/laion_diffusion.log 2>&1
echo "laion_diffusion rc=$? $(date)" >> runs/r5/chain.log
python tools/export_weights.py --checkpoint checkpoints/laion_diffusion_1000ep \
  >> runs/r5/chain.log 2>&1

echo "=== chain done $(date) ===" >> runs/r5/chain.log
touch /tmp/r5_laion_chain_done

"""Measure the reference's PyTorch-CPU throughput yardstick (BASELINE.md).

The reference publishes no numbers, so we time its own code: import
/root/reference/diffusion.py (with a minimal torchvision stub — torchvision
is not installed here and is only needed at import time / in train()), then
time NoiseModel train steps and the 1000-step sampler exactly as its train
loop runs them (batch 128, Adam 1e-3, MSE on eps).

Usage: python tools/measure_reference_baseline.py [--steps 20] [--sample-steps 50]
Writes JSON to stdout.
"""

import argparse
import json
import sys
import time
import types

# Stub the modules the reference imports but never uses during a train step.
for name in ["torchvision", "torchvision.transforms", "torchvision.utils",
             "torchvision.datasets", "matplotlib", "matplotlib.pyplot"]:
    sys.modules.setdefault(name, types.ModuleType(name))
sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]
sys.modules["torchvision"].utils = sys.modules["torchvision.utils"]
sys.modules["torchvision"].datasets = sys.modules["torchvision.datasets"]

sys.path.insert(0, "/root/reference")

import torch  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import diffusion as ref  # noqa: E402  (the reference module)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--sample-steps", type=int, default=50)
    p.add_argument("--threads", type=int, default=0)
    args = p.parse_args()

    if args.threads:
        torch.set_num_threads(args.threads)

    device = torch.device("cpu")
    model = ref.NoiseModel().to(device)
    fp = ref.ForwardProcess()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    model.train()

    x0 = torch.randn(args.batch_size, 1, 28, 28)

    def train_step():
        t = torch.randint(0, fp.num_timesteps, (args.batch_size,), device=device)
        x_t, noise = fp.q_sample(device, x0, t)
        pred = model(x_t, t)
        loss = F.mse_loss(pred, noise)
        opt.zero_grad()
        loss.backward()
        opt.step()

    # Warmup then timed.
    for _ in range(3):
        train_step()
    t0 = time.perf_counter()
    for _ in range(args.steps):
        train_step()
    train_dt = time.perf_counter() - t0
    train_sps = args.steps * args.batch_size / train_dt

    # Sampler: time a truncated reverse loop and scale to 1000 steps
    # (each step costs the same; full 1000 steps on CPU is minutes).
    model.eval()
    n_samples = 16
    x = torch.randn(n_samples, 1, 28, 28)
    with torch.no_grad():
        model(x, torch.zeros(n_samples, dtype=torch.long))  # warmup
        t0 = time.perf_counter()
        for t in reversed(range(fp.num_timesteps - args.sample_steps, fp.num_timesteps)):
            t_tensor = torch.full((n_samples,), t, dtype=torch.long)
            predicted_noise = model(x, t_tensor)
            alpha = fp.alphas[t]
            alpha_cumprod = fp.alphas_cumprod[t]
            beta = fp.betas[t]
            noise = torch.randn_like(x) if t > 0 else torch.zeros_like(x)
            x = (1 / torch.sqrt(alpha)) * (
                x - ((1 - alpha) / torch.sqrt(1 - alpha_cumprod)) * predicted_noise
            ) + torch.sqrt(beta) * noise
        sample_dt = time.perf_counter() - t0
    est_full_chain_sec = sample_dt / args.sample_steps * fp.num_timesteps
    images_per_sec = n_samples / est_full_chain_sec

    print(json.dumps({
        "torch_threads": torch.get_num_threads(),
        "train_samples_per_sec": round(train_sps, 3),
        "train_step_ms": round(train_dt / args.steps * 1e3, 2),
        "sample_1000step_images_per_sec": round(images_per_sec, 5),
        "sample_full_chain_sec_est": round(est_full_chain_sec, 2),
        "batch_size": args.batch_size,
    }))


if __name__ == "__main__":
    main()

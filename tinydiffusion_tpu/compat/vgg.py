"""VGG16 ``features[:16]`` weight seam for the conv-VAE perceptual loss.

The reference's perceptual loss runs recon/target images through a frozen
pretrained torchvision VGG16 prefix (``vgg16(weights=DEFAULT).features[:16]``,
/root/reference/vae_laion.py:170-176) and takes the sum-reduced feature MSE
(:205-218). Notably it feeds [0,1] images straight in — no ImageNet
mean/std normalization — so the seam is purely a weight-format conversion.

``models.vae_conv.PerceptualNet`` mirrors that prefix structurally
(3x3 convs 64,64 | pool | 128,128 | pool | 256,256,256, ReLU after every
conv; torchvision layer indices 0..15). This module converts a torchvision
``vgg16`` state dict (or just its ``features.*`` subset) into the
PerceptualNet param pytree, giving the loss the REAL pretrained features
whenever a weight file is available — the same executable-seam treatment
the SD-VAE (compat/sdvae.py) and CLIP (compat/clip.py) externals got.

Offline (zero egress, torchvision absent) the seeded PerceptualNet remains
the default; the parity oracle is a hand-built torch replica of the
``features[:16]`` Sequential with identical state_dict naming
(tests/test_pretrained_seams.py).
"""

from __future__ import annotations

import numpy as np

# torchvision vgg16: conv layers inside features[:16] sit at these indices
# (ReLU at odd slots, MaxPool2d at 4 and 9). Index -> PerceptualNet name.
VGG16_FEATURES16_CONV_LAYOUT = {
    0: ("conv0_0", 3, 64),
    2: ("conv0_1", 64, 64),
    5: ("conv1_0", 64, 128),
    7: ("conv1_1", 128, 128),
    10: ("conv2_0", 128, 256),
    12: ("conv2_1", 256, 256),
    14: ("conv2_2", 256, 256),
}


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def convert_vgg16_features(state_dict) -> dict:
    """torchvision ``vgg16`` state dict -> ``PerceptualNet`` param pytree.

    Accepts either the full-model dict (``features.N.weight`` keys;
    ``classifier.*`` ignored) or a bare ``features`` Sequential dict
    (``N.weight`` keys). Conv kernels transpose OIHW -> HWIO; every conv in
    the prefix must be present and correctly shaped or this raises.
    """
    sd = dict(state_dict)

    def get(idx: int, leaf: str):
        for key in (f"features.{idx}.{leaf}", f"{idx}.{leaf}"):
            if key in sd:
                return _to_np(sd[key])
        raise KeyError(
            f"VGG16 state dict is missing features[{idx}].{leaf} "
            f"(have {sorted(sd)[:8]}...)"
        )

    params = {}
    for idx, (name, c_in, c_out) in VGG16_FEATURES16_CONV_LAYOUT.items():
        w = get(idx, "weight")
        b = get(idx, "bias")
        assert w.shape == (c_out, c_in, 3, 3), (
            f"features[{idx}] ({name}): weight {w.shape} != "
            f"{(c_out, c_in, 3, 3)}"
        )
        assert b.shape == (c_out,), f"features[{idx}] ({name}): bias {b.shape}"
        params[name] = {
            "kernel": np.transpose(w, (2, 3, 1, 0)),  # OIHW -> HWIO
            "bias": b,
        }
    return params


def load_vgg16_perceptual(path: str) -> dict:
    """Load a torch-saved VGG16 state dict from ``path`` and convert it.

    The file is whatever ``torch.save(vgg16(weights=DEFAULT).state_dict(),
    path)`` (or just the ``features`` prefix) produced — the offline-friendly
    hand-off format, mirroring tools/import_torch_checkpoint.py.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return convert_vgg16_features(obj)

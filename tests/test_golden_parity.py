"""Golden parity: import the reference's own torch models (from
/root/reference, with stubs for its unused heavyweight imports), convert
their randomly-initialized weights via compat.torch_import, and assert our
Flax forward matches torch within fp32 tolerance.

This is the BASELINE.json acceptance criterion's foundation: identical
weights => identical eps-predictions => identical sampling chains given the
same noise stream.
"""

import importlib.machinery
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# Stub modules the reference imports but that are not installed here
# (torchvision, wandb). The reference vae.py also has import-time side
# effects (builds datasets/loaders at module scope, vae.py:79-101), so the
# stubs must be functional enough for that to succeed.
for name in [
    "torchvision", "torchvision.transforms", "torchvision.utils",
    "torchvision.datasets", "wandb",
]:
    mod = types.ModuleType(name)
    # A None __spec__ makes importlib.util.find_spec(name) raise ValueError
    # in ANY later import (transformers probes torchvision that way);
    # a loaderless ModuleSpec keeps the stub inert but probe-safe.
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    sys.modules.setdefault(name, mod)


class _FakeMNIST:
    def __init__(self, *a, **k):
        pass

    def __len__(self):
        return 16

    def __getitem__(self, idx):
        return torch.zeros(1, 28, 28), 0


_tv = sys.modules["torchvision"]
_tv.transforms = sys.modules["torchvision.transforms"]
_tv.utils = sys.modules["torchvision.utils"]
_tv.datasets = sys.modules["torchvision.datasets"]
_tv.transforms.Compose = lambda ts: (lambda x: x)
_tv.transforms.ToTensor = lambda: (lambda x: x)
_tv.transforms.Normalize = lambda *a, **k: (lambda x: x)
_tv.datasets.MNIST = _FakeMNIST

from tests.reference_loader import load_reference  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tinydiffusion_tpu.compat.torch_import import (  # noqa: E402
    import_dit,
    import_mlp_unet,
    import_unet28,
    import_vae_mnist,
)


def _sd_numpy(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_unet28_matches_reference():
    ref = load_reference("diffusion")

    tmodel = ref.NoiseModel()
    tmodel.eval()

    from tinydiffusion_tpu.models.unet28 import UNet28

    variables = import_unet28(_sd_numpy(tmodel))
    jmodel = UNet28()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 1, 28, 28)).astype(np.float32)
    t = np.array([3, 977], dtype=np.int64)

    with torch.no_grad():
        ref_out = tmodel(torch.from_numpy(x), torch.from_numpy(t)).numpy()

    ours = jmodel.apply(
        variables,
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(t, jnp.int32),
        train=False,
    )
    ours_nchw = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    np.testing.assert_allclose(ours_nchw, ref_out, atol=2e-4, rtol=1e-3)


def test_conditional_unet28_matches_reference():
    ref = load_reference("conditional_diffusion")

    tmodel = ref.NoiseModel()
    tmodel.eval()

    from tinydiffusion_tpu.models.unet28 import UNet28

    variables = import_unet28(_sd_numpy(tmodel), conditional=True)
    jmodel = UNet28(num_classes=10)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 1, 28, 28)).astype(np.float32)
    t = np.array([0, 500], dtype=np.int64)
    y = np.array([7, 2], dtype=np.int64)

    with torch.no_grad():
        ref_out = tmodel(
            torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(y)
        ).numpy()

    ours = jmodel.apply(
        variables,
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(t, jnp.int32),
        jnp.asarray(y, jnp.int32),
        train=False,
    )
    ours_nchw = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    np.testing.assert_allclose(ours_nchw, ref_out, atol=2e-4, rtol=1e-3)


def test_vae_mnist_matches_reference():
    ref_vae = load_reference("vae")

    tmodel = ref_vae.VAE(ref_vae.VAEConfig())
    tmodel.eval()

    from tinydiffusion_tpu.models.vae_mnist import VAEMnist

    variables = import_vae_mnist(_sd_numpy(tmodel))
    jmodel = VAEMnist()

    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, (4, 784)).astype(np.float32)
    with torch.no_grad():
        t_mu, t_logvar = tmodel.encode(torch.from_numpy(x))
        t_dec = tmodel.decode(t_mu).numpy()
    mu, logvar = jmodel.apply(variables, jnp.asarray(x), method=VAEMnist.encode)
    np.testing.assert_allclose(np.asarray(mu), t_mu.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(logvar), t_logvar.numpy(), atol=1e-5, rtol=1e-4)
    dec = jmodel.apply(variables, mu, method=VAEMnist.decode)
    np.testing.assert_allclose(np.asarray(dec), t_dec, atol=1e-5, rtol=1e-4)


def test_mlp_unet_matches_reference():
    ref = load_reference("latent_diffusion")

    tmodel = ref.NoiseModel()
    tmodel.eval()

    from tinydiffusion_tpu.models.mlp_unet import MLPUNetLatent

    variables = import_mlp_unet(_sd_numpy(tmodel))
    jmodel = MLPUNetLatent()

    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, 20)).astype(np.float32)
    t = np.array([1, 10, 100, 999], dtype=np.int64)
    y = np.array([0, 3, 7, 9], dtype=np.int64)
    with torch.no_grad():
        ref_out = tmodel(
            torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(y)
        ).numpy()
    ours = jmodel.apply(
        variables, jnp.asarray(x), jnp.asarray(t, jnp.int32), jnp.asarray(y, jnp.int32),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=2e-4, rtol=1e-3)


@pytest.mark.heavy
def test_dit_matches_reference():
    ref = load_reference("diffusion_transformer")

    tmodel = ref.NoiseModel()
    tmodel.eval()

    from tinydiffusion_tpu.models.dit import DiT

    variables = import_dit(_sd_numpy(tmodel))
    jmodel = DiT()

    rng = np.random.default_rng(4)
    x = rng.standard_normal((4, 20)).astype(np.float32)
    t = np.array([1, 10, 100, 999], dtype=np.int64)
    y = np.array([0, 3, 7, 9], dtype=np.int64)
    with torch.no_grad():
        ref_out = tmodel(
            torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(y)
        ).numpy()
    ours = jmodel.apply(
        variables, jnp.asarray(x), jnp.asarray(t, jnp.int32), jnp.asarray(y, jnp.int32),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=2e-4, rtol=1e-3)

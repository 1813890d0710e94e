"""Text-encoder and latent-codec substitute seams
(conditional_diffusion_laion.py:207-219, 605-612 parity surfaces)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tinydiffusion_tpu.compat.latent_codec import LinearPatchCodec, get_latent_codec
from tinydiffusion_tpu.compat.text_encoder import HashTextEncoder, get_text_encoder


def test_hash_encoder_contract():
    enc = HashTextEncoder(768)
    e = enc.encode(["a photo of a cat", "a photo of a dog", ""])
    assert e.shape == (3, 768) and e.dtype == np.float32
    # deterministic
    np.testing.assert_array_equal(e, enc.encode(["a photo of a cat", "a photo of a dog", ""]))
    # shared words => closer than unrelated text
    sim_related = np.dot(e[0], e[1]) / (np.linalg.norm(e[0]) * np.linalg.norm(e[1]))
    other = enc.encode(["quantum flux manifolds diverge"])[0]
    sim_unrelated = np.dot(e[0], other) / (np.linalg.norm(e[0]) * np.linalg.norm(other))
    assert sim_related > sim_unrelated


@pytest.mark.heavy
def test_auto_encoder_falls_back_offline():
    enc = get_text_encoder("auto", 768)
    assert enc.encode(["x"]).shape == (1, 768)


def test_patch_codec_shapes_and_scaling():
    codec = LinearPatchCodec(image_size=64, latent_size=32)
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, 64, 64, 3)), jnp.float32)
    z = codec.encode(x)
    assert z.shape == (2, 32, 32, 4)
    out = codec.decode(z)
    assert out.shape == (2, 64, 64, 3)


def test_patch_codec_projection_consistency():
    """decode is the exact right-inverse on the latent subspace:
    encode(decode(z)) == z (orthonormal columns)."""
    codec = LinearPatchCodec(image_size=64, latent_size=32)
    z = jnp.asarray(np.random.default_rng(1).standard_normal((2, 32, 32, 4)), jnp.float32)
    z2 = codec.encode(codec.decode(z))
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=1e-4, rtol=1e-4)


def test_codec_auto_falls_back_offline():
    codec = get_latent_codec("auto", image_size=64)
    assert isinstance(codec, LinearPatchCodec)


def test_patch_codec_pca_calibration():
    """calibrate() fits patch-PCA axes + mean + per-channel whitening:
    latents come out unit-variance per channel, decode fidelity beats the
    uncalibrated random projection, and the right-inverse contract
    (encode(decode(z)) == z) still holds."""
    from tinydiffusion_tpu.data.laion import synthesize_image

    imgs = np.stack(
        [synthesize_image(i, 64)[0] for i in range(24)]
    ).astype(np.float32) * (2 / 255) - 1
    x = jnp.asarray(imgs)

    codec = LinearPatchCodec(image_size=64, latent_size=32)
    err_random = float(jnp.mean(jnp.abs(codec.decode(codec.encode(x)) - x)))
    codec.calibrate(x)
    z = codec.encode(x)
    err_pca = float(jnp.mean(jnp.abs(codec.decode(z) - x)))
    assert err_pca < 0.5 * err_random, (err_pca, err_random)

    ch_std = np.asarray(z).reshape(-1, z.shape[-1]).std(axis=0)
    np.testing.assert_allclose(ch_std, 1.0, atol=0.05)

    z0 = jnp.asarray(np.random.default_rng(3).standard_normal((2, 32, 32, 4)),
                     jnp.float32)
    np.testing.assert_allclose(
        np.asarray(codec.encode(codec.decode(z0))), np.asarray(z0),
        atol=1e-3, rtol=1e-3,
    )

"""SD-v1.4 VAE naming/topology manifest checks (round-2 VERDICT weak #4).

The parity oracle (tests/torch_sdvae_ref.py) and the converter
(compat/sdvae.convert_diffusers_vae) are both builder-written — a shared
misunderstanding of diffusers' AutoencoderKL would pass parity while
diverging from the real checkpoint format. These tests pin both sides to a
vendored manifest of the CompVis/stable-diffusion-v1-4 ``vae`` subfolder:
the full 248-key state_dict name->shape table (83.65M params — the published
SD-VAE parameter count) and its ``config.json``. Reference load site:
/root/reference/conditional_diffusion_laion.py:605-612.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def manifest():
    with open(os.path.join(FIXTURES, "sd_v1_4_vae_state_dict.json")) as f:
        return {k: tuple(v) for k, v in json.load(f).items()}


@pytest.fixture(scope="module")
def vae_config():
    with open(os.path.join(FIXTURES, "sd_v1_4_vae_config.json")) as f:
        return json.load(f)


def test_manifest_parameter_count(manifest):
    n = sum(int(np.prod(s)) for s in manifest.values())
    assert n == 83_653_863, n  # the published SD v1.x VAE size


def test_torch_replica_matches_manifest(manifest, vae_config):
    """AutoencoderKLRef at full SD-v1.4 size emits exactly the diffusers
    state_dict naming and shapes — the oracle cannot silently drift."""
    from tests.torch_sdvae_ref import AutoencoderKLRef

    model = AutoencoderKLRef(
        block_out_channels=tuple(vae_config["block_out_channels"]),
        layers_per_block=vae_config["layers_per_block"],
        latent_channels=vae_config["latent_channels"],
        norm_num_groups=vae_config["norm_num_groups"],
    )
    got = {k: tuple(v.shape) for k, v in model.state_dict().items()}
    assert got == manifest


def test_converter_tree_matches_manifest(manifest):
    """convert_diffusers_vae consumes the exact checkpoint key set and the
    converted tree wires into the pure-jnp forward at full size
    (jax.eval_shape — topology without compute)."""
    from tinydiffusion_tpu.compat.sdvae import (
        convert_diffusers_vae,
        vae_decode,
        vae_encode_moments,
    )

    fake = {k: np.zeros(s, np.float32) for k, s in manifest.items()}
    tree = convert_diffusers_vae(fake)
    leaves = jax.tree.leaves(tree)
    assert len(leaves) == len(manifest)
    # Spot-check the layout transposes against the manifest shapes.
    enc_in = tree["encoder"]["conv_in"]["weight"]
    assert enc_in.shape == (3, 3, 3, 128)  # OIHW (128,3,3,3) -> HWIO
    attn_q = tree["encoder"]["mid_block"]["attentions"]["0"]["to_q"]["weight"]
    assert attn_q.shape == (512, 512)

    moments = jax.eval_shape(
        vae_encode_moments, tree,
        jax.ShapeDtypeStruct((1, 256, 256, 3), jnp.float32),
    )
    assert moments.shape == (1, 32, 32, 8)
    img = jax.eval_shape(
        vae_decode, tree, jax.ShapeDtypeStruct((1, 32, 32, 4), jnp.float32)
    )
    assert img.shape == (1, 256, 256, 3)


def test_config_fixture_matches_codec_constants(vae_config):
    from tinydiffusion_tpu.compat.sdvae import SD_SCALING_FACTOR, SD_VAE_CONFIG

    assert tuple(vae_config["block_out_channels"]) == SD_VAE_CONFIG[
        "block_out_channels"
    ]
    assert vae_config["layers_per_block"] == SD_VAE_CONFIG["layers_per_block"]
    assert vae_config["latent_channels"] == SD_VAE_CONFIG["latent_channels"]
    assert vae_config["norm_num_groups"] == SD_VAE_CONFIG["norm_num_groups"]
    assert vae_config["scaling_factor"] == SD_SCALING_FACTOR

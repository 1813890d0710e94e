"""UNet28 structural tests: shapes, parameter census, jit-ability,
conditional variant (reference: diffusion.py:11-162, conditional_diffusion.py:14-171)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from tinydiffusion_tpu.models.unet28 import UNet28


def _init(model, conditional=False, batch=2):
    x = jnp.zeros((batch, 28, 28, 1))
    t = jnp.zeros((batch,), jnp.int32)
    if conditional:
        y = jnp.zeros((batch,), jnp.int32)
        return model.init(jax.random.PRNGKey(0), x, t, y), (x, t, y)
    return model.init(jax.random.PRNGKey(0), x, t), (x, t)


@pytest.mark.heavy  # ~17s compile; conditional shape test keeps quick coverage — r5
def test_output_shape_unconditional():
    model = UNet28()
    variables, args = _init(model)
    out = model.apply(variables, *args, train=False)
    assert out.shape == (2, 28, 28, 1)


def test_output_shape_conditional():
    model = UNet28(num_classes=10)
    variables, (x, t, y) = _init(model, conditional=True)
    out = model.apply(variables, x, t, y, train=False)
    assert out.shape == (2, 28, 28, 1)


def test_class_conditioning_changes_output():
    model = UNet28(num_classes=10)
    variables, (x, t, _) = _init(model, conditional=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(x.shape), jnp.float32)
    out0 = model.apply(variables, x, t, jnp.zeros((2,), jnp.int32), train=False)
    out7 = model.apply(variables, x, t, jnp.full((2,), 7, jnp.int32), train=False)
    assert not np.allclose(np.asarray(out0), np.asarray(out7))


def test_time_conditioning_changes_output():
    model = UNet28()
    variables, (x, _) = _init(model)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(x.shape), jnp.float32)
    out_a = model.apply(variables, x, jnp.zeros((2,), jnp.int32), train=False)
    out_b = model.apply(variables, x, jnp.full((2,), 999, jnp.int32), train=False)
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))


def test_param_structure():
    """Module census mirrors the reference layer list (diffusion.py:16-107)."""
    model = UNet28()
    variables, _ = _init(model)
    params = variables["params"]
    expected = {
        "time_embedding", "initial_conv", "enc1", "enc2", "enc3", "bottleneck",
        "dec3", "dec2", "dec1", "final_conv", "time_proj1", "time_proj2", "time_proj3",
    }
    assert set(params.keys()) == expected
    # Exactly the reference UNet's parameter count: 11,182,273 (measured by
    # instantiating reference diffusion.py NoiseModel; SURVEY.md's ~26M
    # estimate was wrong).
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    assert n_params == 11_182_273, n_params


def test_batchnorm_mutates_in_train_mode():
    model = UNet28()
    variables, (x, t) = _init(model)
    out, mutated = model.apply(variables, x, t, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 28, 28, 1)
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


@pytest.mark.heavy  # ~19s compile — re-tiered r5
def test_jit_and_bfloat16():
    model = UNet28(dtype=jnp.bfloat16)
    variables, (x, t) = _init(model)
    fn = jax.jit(lambda v, x, t: model.apply(v, x, t, train=False))
    out = fn(variables, x, t)
    assert out.dtype == jnp.float32  # head casts back to fp32
    assert out.shape == (2, 28, 28, 1)

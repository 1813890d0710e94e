"""DeviceDataset: HBM-resident batches replay the host BatchIterator stream
bit-identically, and make_resident_multi_step trains identically to
single-step dispatches over the same batches."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tinydiffusion_tpu.core.schedule import DiffusionSchedule
from tinydiffusion_tpu.data.device import DeviceDataset
from tinydiffusion_tpu.data.loader import BatchIterator
from tinydiffusion_tpu.models.mlp_unet import MLPUNetLatent
from tinydiffusion_tpu.train.trainer import (
    create_train_state,
    make_resident_multi_step,
    make_train_step,
)

N, B, D = 50, 8, 20


def _data(rng):
    imgs = rng.integers(0, 256, (N, D), dtype=np.uint8)
    labels = rng.integers(0, 10, (N,)).astype(np.int32)
    return imgs, labels


def test_resident_batches_match_host_iterator(rng):
    imgs, labels = _data(rng)
    u8 = (2.0 / 255.0, -1.0)

    host_it = BatchIterator([imgs, labels], B, shuffle=True, seed=3,
                            u8_normalize=u8)
    ds = DeviceDataset([imgs, labels], B, shuffle=True, seed=3,
                       u8_normalize=u8)

    idxs = ds.epoch_index_batches(epoch=2)
    gathered = [jax.jit(ds.gather)(jnp.asarray(i)) for i in idxs]
    for (hx, hy), (dx, dy) in zip(host_it.epoch(2), gathered):
        np.testing.assert_allclose(np.asarray(dx), hx, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(dy), hy)


@pytest.mark.heavy
def test_resident_latent_multi_step_matches_single_steps(rng):
    """make_resident_latent_multi_step (frozen-VAE encode in-program over
    the pinned split) trains like the per-batch latent step."""
    from tinydiffusion_tpu.models.vae_mnist import VAEMnist
    from tinydiffusion_tpu.train.trainer import (
        make_latent_train_step,
        make_resident_latent_multi_step,
    )

    imgs = rng.integers(0, 256, (N, 28, 28, 1), dtype=np.uint8)
    labels = rng.integers(0, 10, (N,)).astype(np.int32)
    u8 = (2.0 / 255.0, -1.0)
    ds = DeviceDataset([imgs, labels], B, shuffle=True, seed=1,
                       u8_normalize=u8)
    idxs = jnp.asarray(ds.epoch_index_batches(epoch=0))

    vae = VAEMnist(latent_dim=D)
    vae_params = vae.init(
        jax.random.PRNGKey(7), jnp.zeros((2, 28, 28, 1)), jax.random.PRNGKey(0)
    )["params"]
    schedule = DiffusionSchedule.linear(50)
    model = MLPUNetLatent(latent_dim=D)
    tx = optax.sgd(1e-2)
    y0 = jnp.zeros((B,), jnp.int32)
    example = (jnp.zeros((B, D), jnp.float32), y0, y0)

    s_res = create_train_state(model, tx, example, jax.random.PRNGKey(0))
    resident = make_resident_latent_multi_step(vae, model, tx, schedule, ds)
    s_res, losses_res = resident(s_res, vae_params, idxs)

    s_host = create_train_state(model, tx, example, jax.random.PRNGKey(0))
    single = make_latent_train_step(vae, model, tx, schedule)
    losses_host = []
    for i in np.asarray(idxs):
        x = jnp.asarray(imgs[i]).astype(jnp.float32) * u8[0] + u8[1]
        s_host, loss = single(s_host, vae_params, x, jnp.asarray(labels[i]))
        losses_host.append(float(loss))

    np.testing.assert_allclose(np.asarray(losses_res), np.asarray(losses_host),
                               rtol=2e-2, atol=1e-4)


@pytest.mark.heavy
def test_resident_multi_step_matches_single_steps(rng):
    imgs, labels = _data(rng)
    u8 = (2.0 / 255.0, -1.0)
    ds = DeviceDataset([imgs, labels], B, shuffle=True, seed=0,
                       u8_normalize=u8)
    idxs = jnp.asarray(ds.epoch_index_batches(epoch=0))

    schedule = DiffusionSchedule.linear(50)
    model = MLPUNetLatent(latent_dim=D)
    # SGD: Adam's ~sign(g) early steps amplify the rounding of XLA's
    # different normalize-fusion inside the scanned program into
    # visible drift (same rule as the mesh equivalence tests).
    tx = optax.sgd(1e-2)
    y0 = jnp.zeros((B,), jnp.int32)
    example = (jnp.zeros((B, D), jnp.float32), y0, y0)

    s_res = create_train_state(model, tx, example, jax.random.PRNGKey(0))
    resident = make_resident_multi_step(model, tx, schedule, ds,
                                        conditional=True)
    s_res, losses_res = resident(s_res, idxs)

    s_host = create_train_state(model, tx, example, jax.random.PRNGKey(0))
    single = make_train_step(model, tx, schedule, conditional=True)
    losses_host = []
    for i in np.asarray(idxs):
        x = jnp.asarray(imgs[i]).astype(jnp.float32) * u8[0] + u8[1]
        s_host, loss = single(s_host, x, jnp.asarray(labels[i]))
        losses_host.append(float(loss))

    # In-program gather+normalize fuses differently than the standalone
    # normalize op (rounding seeds compound over steps even under SGD), so
    # training matches at fp tolerance, not bitwise; batch COMPOSITION is
    # exact (test above).
    np.testing.assert_allclose(np.asarray(losses_res), np.asarray(losses_host),
                               rtol=2e-2, atol=1e-4)
    for a, b in zip(jax.tree.leaves(s_res.params), jax.tree.leaves(s_host.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=5e-3)


@pytest.mark.heavy
def test_resident_multi_step_dp_equals_single(rng):
    """Resident scan under an 8-device DP mesh == single-device resident
    scan on the same pinned data and index stream (round-2 VERDICT next #1:
    the fastest data path must work under the mesh, not fall back).

    The pinned uint8 arrays ride replicated; the (K, B) index batches shard
    over ``data`` on the batch dim, so each chip gathers only its own batch
    rows from its local copy — data parallelism with zero cross-chip data
    traffic, only the XLA gradient all-reduce."""
    from tinydiffusion_tpu.parallel.mesh import make_mesh, replicated_sharding

    assert len(jax.devices()) == 8, "conftest must provide 8 fake devices"
    imgs, labels = _data(rng)
    u8 = (2.0 / 255.0, -1.0)
    schedule = DiffusionSchedule.linear(50)
    model = MLPUNetLatent(latent_dim=D)
    # SGD for linear-in-gradient comparison (same rule as test_train_dp).
    tx = optax.sgd(1e-2)
    y0 = jnp.zeros((B,), jnp.int32)
    example = (jnp.zeros((B, D), jnp.float32), y0, y0)
    mesh = make_mesh(("data",))

    ds_single = DeviceDataset([imgs, labels], B, shuffle=True, seed=0,
                              u8_normalize=u8)
    idxs = jnp.asarray(ds_single.epoch_index_batches(epoch=0))

    s1 = create_train_state(model, tx, example, jax.random.PRNGKey(0))
    step1 = make_resident_multi_step(model, tx, schedule, ds_single,
                                     conditional=True)
    s1, losses1 = step1(s1, idxs)

    ds_dp = DeviceDataset([imgs, labels], B, shuffle=True, seed=0,
                          u8_normalize=u8,
                          sharding=replicated_sharding(mesh))
    s2 = create_train_state(model, tx, example, jax.random.PRNGKey(0))
    step2 = make_resident_multi_step(model, tx, schedule, ds_dp,
                                     conditional=True, mesh=mesh)
    s2, losses2 = step2(s2, idxs)

    # Step 0-1 match bitwise; the 8-way sharded gradient all-reduce then
    # sums in a different order than the single-device reduction and the
    # rounding compounds over SGD steps — same tolerance family as the
    # host-vs-resident comparison above.
    np.testing.assert_allclose(np.asarray(losses1), np.asarray(losses2),
                               rtol=2e-2, atol=1e-4)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=5e-3)


def test_resolve_data_placement():
    """The 'auto' promotion contract: device when it fits, host when it
    doesn't, hard error on typos, mesh-divisibility fallback."""
    from tinydiffusion_tpu.experiments.common import (
        RESIDENT_AUTO_LIMIT_BYTES,
        resolve_data_placement,
    )
    from tinydiffusion_tpu.parallel.mesh import make_mesh

    assert resolve_data_placement("auto", 1 << 20, 8) is True
    assert resolve_data_placement(
        "auto", RESIDENT_AUTO_LIMIT_BYTES + 1, 8) is False
    assert resolve_data_placement(
        "device", RESIDENT_AUTO_LIMIT_BYTES + 1, 8) is True  # explicit wins
    assert resolve_data_placement("host", 1, 8) is False
    mesh = make_mesh(("data",))  # 8 fake devices
    assert resolve_data_placement("auto", 1 << 20, 16, mesh) is True
    assert resolve_data_placement("auto", 1 << 20, 12, mesh) is False
    import pytest as _pytest

    with _pytest.raises(ValueError):
        resolve_data_placement("gpu", 1, 8)


def test_resident_eval_matches_host_loop(rng):
    """make_resident_eval's one-dispatch scan reproduces the host-streamed
    val loop exactly: same batches (unshuffled drop-last), same
    fold_in(base, epoch*10000 + i) keys, same per-batch losses — on a
    single device AND under the 8-device DP mesh."""
    from tinydiffusion_tpu.parallel.mesh import make_mesh, replicated_sharding
    from tinydiffusion_tpu.train.trainer import (
        make_eval_step,
        make_resident_eval,
        raw_eval_fn,
    )

    imgs, labels = _data(rng)
    u8 = (2.0 / 255.0, -1.0)
    schedule = DiffusionSchedule.linear(50)
    model = MLPUNetLatent(latent_dim=D)
    tx = optax.sgd(1e-2)
    y0 = jnp.zeros((B,), jnp.int32)
    example = (jnp.zeros((B, D), jnp.float32), y0, y0)
    state = create_train_state(model, tx, example, jax.random.PRNGKey(0))
    base_key = jax.random.PRNGKey(41)
    epoch = 3

    # Host-streamed reference pass.
    host_it = BatchIterator([imgs, labels], B, shuffle=False,
                            u8_normalize=u8)
    eval_step = make_eval_step(model, schedule, conditional=True)
    host_losses = []
    for i, (x0, y) in enumerate(host_it.epoch()):
        key = jax.random.fold_in(base_key, epoch * 10000 + i)
        host_losses.append(float(eval_step(
            state.params, state.batch_stats, jnp.asarray(x0), key,
            jnp.asarray(y),
        )))

    _eval = raw_eval_fn(model, schedule, conditional=True)

    def body(ctx, batch, key):
        return _eval(ctx[0], ctx[1], batch[0], key, batch[1])

    # Single device.
    ds = DeviceDataset([imgs, labels], B, shuffle=False, u8_normalize=u8)
    resident_eval = make_resident_eval(body, ds, base_key)
    got = np.asarray(resident_eval(
        (state.params, state.batch_stats), epoch, ds.epoch_index_batches(0)
    ))
    np.testing.assert_allclose(got, host_losses, rtol=1e-6, atol=1e-7)

    # DP mesh: replicated pin, idx batches sharded over 'data'.
    mesh = make_mesh(("data",))
    ds_dp = DeviceDataset([imgs, labels], B, shuffle=False, u8_normalize=u8,
                          sharding=replicated_sharding(mesh))
    resident_eval_dp = make_resident_eval(body, ds_dp, base_key, mesh=mesh)
    got_dp = np.asarray(resident_eval_dp(
        (state.params, state.batch_stats), epoch,
        ds_dp.epoch_index_batches(0),
    ))
    np.testing.assert_allclose(got_dp, host_losses, rtol=1e-5, atol=1e-6)

"""K-dispatch cadence gate: `_window_contains_multiple` must be the exact
generalization of the reference's per-batch `batch_idx % every == 0` gates
(log every 10 batches, conditional_diffusion_laion.py:475-478; sample every
100 batches, :479-496) when an epoch is consumed in K-batch windows — each
gate point fires exactly once whatever K divides into `every`.

Pure-Python (no jax compile) — stays in the quick tier.
"""

from tinydiffusion_tpu.experiments.conditional_diffusion_laion import (
    _window_contains_multiple,
)


def test_k1_matches_per_batch_gate():
    # Degenerate single-batch windows must reproduce batch_idx % every == 0.
    for every in (1, 3, 10, 100):
        for i in range(250):
            assert _window_contains_multiple(i, i, every) == (i % every == 0)
            assert _window_contains_multiple(i, i, every, positive_only=True) == (
                i % every == 0 and i > 0
            )


def test_partition_fires_exactly_once_per_gate_point():
    # Partition [0, n) into K-sized windows (ragged tail included): for
    # every >= k (the usage regime — steps_per_dispatch <= log_every /
    # sample_every_batches), the number of windows that fire must equal
    # the number of gate points, including when K does not divide `every`
    # (the r2-ADVICE double-log / skip bug this helper replaced).
    n = 1000
    for every in (1, 7, 10, 100):
        for k in (1, 3, 7, 10, 16):
            if every < k:
                continue
            fires = sum(
                _window_contains_multiple(lo, min(lo + k, n) - 1, every)
                for lo in range(0, n, k)
            )
            expected = len([i for i in range(n) if i % every == 0])
            assert fires == expected, (every, k)

            fires_pos = sum(
                _window_contains_multiple(
                    lo, min(lo + k, n) - 1, every, positive_only=True
                )
                for lo in range(0, n, k)
            )
            expected_pos = len([i for i in range(1, n) if i % every == 0])
            assert fires_pos == expected_pos, (every, k)


def test_disabled_and_empty_windows():
    # every <= 0 disables the gate (sample_every_batches=0 CLI contract).
    assert not _window_contains_multiple(0, 99, 0)
    assert not _window_contains_multiple(0, 99, -5)
    # positive_only with a window entirely at/below zero never fires.
    assert not _window_contains_multiple(0, 0, 1, positive_only=True)
    # A window straddling several multiples still reports a single True —
    # the caller fires once per window by design, so with every < k the
    # gate COALESCES points rather than double-firing.
    assert _window_contains_multiple(0, 999, 100)
    assert (
        sum(_window_contains_multiple(lo, lo + 9, 2) for lo in range(0, 100, 10))
        == 10
    )

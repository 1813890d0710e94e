"""FID evaluation stack: Frechet math against closed forms, feature-net
training on the synthetic digit set, and end-to-end score ordering
(real < noise). The reference has no quantitative quality metric at all
(SURVEY.md section 4) — this is framework-added capability."""

import numpy as np
import pytest

from tinydiffusion_tpu.eval.fid import (
    FeatureNet,
    classifier_accuracy,
    featurize,
    fid_from_stats,
    frechet_gaussian_stats,
    fid_score,
    train_feature_net,
)


class TestFrechetMath:
    def test_identical_gaussians_zero(self):
        rng = np.random.default_rng(0)
        mu = rng.standard_normal(8)
        a = rng.standard_normal((8, 8))
        sigma = a @ a.T + np.eye(8)
        assert fid_from_stats(mu, sigma, mu, sigma) == pytest.approx(
            0.0, abs=1e-8
        )

    def test_mean_shift_only(self):
        # Same covariance: FID reduces to |mu1 - mu2|^2.
        rng = np.random.default_rng(1)
        a = rng.standard_normal((6, 6))
        sigma = a @ a.T + np.eye(6)
        mu1 = np.zeros(6)
        mu2 = np.full(6, 2.0)
        assert fid_from_stats(mu1, sigma, mu2, sigma) == pytest.approx(
            float((mu2 - mu1) @ (mu2 - mu1)), rel=1e-9
        )

    def test_diagonal_closed_form(self):
        # Diagonal covariances: tr(S1 + S2 - 2 sqrt(S1 S2)) =
        # sum (sqrt(d1) - sqrt(d2))^2.
        d1 = np.array([1.0, 4.0, 9.0])
        d2 = np.array([4.0, 1.0, 16.0])
        expected = float(((np.sqrt(d1) - np.sqrt(d2)) ** 2).sum())
        got = fid_from_stats(
            np.zeros(3), np.diag(d1), np.zeros(3), np.diag(d2)
        )
        assert got == pytest.approx(expected, rel=1e-9)

    def test_stats_shapes(self):
        feats = np.random.default_rng(2).standard_normal((100, 5))
        mu, sigma = frechet_gaussian_stats(feats)
        assert mu.shape == (5,) and sigma.shape == (5, 5)
        # Covariance symmetric PSD.
        assert np.allclose(sigma, sigma.T)
        assert np.linalg.eigvalsh(sigma).min() > -1e-10

    def test_rejects_degenerate_input(self):
        with pytest.raises(ValueError):
            frechet_gaussian_stats(np.zeros((1, 5)))


@pytest.fixture(scope="module")
def tiny_mnist(tmp_path_factory):
    from tinydiffusion_tpu.data.mnist import load_mnist

    root = str(tmp_path_factory.mktemp("mnist"))
    x_train, y_train = load_mnist(root, train=True, synthetic_n=2048)
    x_test, y_test = load_mnist(root, train=False, synthetic_n=512)
    return x_train, y_train, x_test, y_test


@pytest.fixture(scope="module")
def trained_net(tiny_mnist):
    x_train, y_train, _, _ = tiny_mnist
    return train_feature_net(
        x_train, y_train, epochs=2, batch_size=128, seed=0, feature_dim=64
    )


@pytest.mark.heavy  # 180s+ module fixture (feature-net training) — re-tiered r5
class TestFeatureNet:
    def test_learns_synthetic_digits(self, tiny_mnist, trained_net):
        _, _, x_test, y_test = tiny_mnist
        model, params = trained_net
        acc = classifier_accuracy(model, params, x_test, y_test)
        assert acc > 0.8, f"feature net failed to learn: acc={acc}"

    def test_featurize_padding_invariant(self, tiny_mnist, trained_net):
        # The tail batch is zero-padded then trimmed; features must not
        # depend on the batch split.
        _, _, x_test, _ = tiny_mnist
        model, params = trained_net
        f_small = featurize(model, params, x_test[:100], batch_size=32)
        f_large = featurize(model, params, x_test[:100], batch_size=512)
        assert f_small.shape == (100, 64)
        np.testing.assert_allclose(f_small, f_large, atol=1e-5)

    def test_fid_ordering_real_vs_noise(self, tiny_mnist, trained_net):
        x_train, _, x_test, _ = tiny_mnist
        model, params = trained_net
        real_stats = frechet_gaussian_stats(featurize(model, params, x_test))
        fid_real = fid_score(
            model, params, x_test, x_train[:512], real_stats=real_stats
        )
        noise = (
            np.random.default_rng(3)
            .standard_normal((512, 28, 28, 1))
            .astype(np.float32)
        )
        fid_noise = fid_score(
            model, params, x_test, noise, real_stats=real_stats
        )
        assert fid_real < fid_noise / 10, (fid_real, fid_noise)
        assert fid_real >= 0.0


class TestVariantGrammar:
    def test_parse(self):
        import sys, os

        sys.path.insert(
            0,
            os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"),
        )
        from fid_eval import parse_variant

        assert parse_variant("ddpm") == ("ddpm", 0, "float32")
        assert parse_variant("ddim50") == ("ddim", 50, "float32")
        assert parse_variant("ddpm-bf16") == ("ddpm", 0, "bfloat16")
        assert parse_variant("ddim10-bf16") == ("ddim", 10, "bfloat16")
        assert parse_variant("dpmpp10") == ("dpmpp", 10, "float32")
        assert parse_variant("dpmpp") == ("dpmpp", 20, "float32")
        assert parse_variant("dpmpp15-bf16") == ("dpmpp", 15, "bfloat16")
        with pytest.raises(ValueError):
            parse_variant("plms")

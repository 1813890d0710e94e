"""Quantitative sample-quality evaluation (FID).

The reference has no quantitative quality metric of any kind — its
verification is visual inspection of per-epoch sample grids
(diffusion.py:242-250, SURVEY.md section 4). This package adds a measured
quality axis on top of that: Frechet Inception Distance computed in the
feature space of a small MNIST classifier trained in-repo (offline; no
pretrained Inception download in a zero-egress environment).
"""

from tinydiffusion_tpu.eval.fid import (  # noqa: F401
    FeatureNet,
    fid_from_stats,
    frechet_gaussian_stats,
    featurize,
    train_feature_net,
)

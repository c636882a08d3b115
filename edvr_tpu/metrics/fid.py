"""FID: Frechet Inception Distance (reference: basicsr/metrics/fid.py).

``calculate_fid`` is the exact Frechet distance between two Gaussians
(numpy/scipy). Feature extraction uses an InceptionV3-pool3 network; a
flax port plus a torchvision-weight converter lives in
edvr_tpu/archs/inception.py (pretrained weights must be supplied —
this environment has no network access, matching the reference's
download-on-first-use behavior, basicsr/models/archs/inception.py).
"""

from __future__ import annotations

import numpy as np
from scipy import linalg


def load_patched_inception_v3(weights_path: str | None = None):
    """Build the FID InceptionV3 (pool3) feature extractor.

    Returns (apply_fn, params) where apply_fn maps (n, 299, 299, 3)
    RGB [0, 1] images to (n, 2048) features.
    """
    from edvr_tpu.archs.inception import build_fid_inception
    return build_fid_inception(weights_path)


def extract_inception_features(data_generator, inception_fn, len_generator=None):
    """Extract inception features over a generator of NHWC batches
    (reference: fid.py:28-55)."""
    features = []
    for data in data_generator:
        features.append(np.asarray(inception_fn(data)))
    return np.concatenate(features, axis=0)


def calculate_fid(mu1, sigma1, mu2, sigma2, eps=1e-6) -> float:
    """Frechet distance between two multivariate Gaussians
    (reference: basicsr/metrics/fid.py:58-80).

    d^2 = |mu1 - mu2|^2 + Tr(C1 + C2 - 2 sqrt(C1 C2))
    """
    assert mu1.shape == mu2.shape
    assert sigma1.shape == sigma2.shape

    # scipy deprecated/removed the disp kwarg; non-finite results are
    # handled by the singularity fallback below either way
    try:
        cov_sqrt = linalg.sqrtm(sigma1 @ sigma2)
    except Exception:
        cov_sqrt = np.full_like(sigma1, np.nan)

    # numerical instability of sqrtm
    if not np.isfinite(cov_sqrt).all():
        print('Product of cov matrices is singular. Adding '
              f'{eps} to diagonal of cov estimates')
        offset = np.eye(sigma1.shape[0]) * eps
        cov_sqrt = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))

    if np.iscomplexobj(cov_sqrt):
        if not np.allclose(np.diagonal(cov_sqrt).imag, 0, atol=1e-3):
            m = np.max(np.abs(cov_sqrt.imag))
            raise ValueError(f'Imaginary component {m}')
        cov_sqrt = cov_sqrt.real

    mean_diff = mu1 - mu2
    mean_norm = mean_diff @ mean_diff
    trace = np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(cov_sqrt)
    return float(mean_norm + trace)

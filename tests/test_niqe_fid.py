"""NIQE golden test (values computed with the reference implementation
on the same deterministic inputs) + FID math sanity."""

import cv2
import numpy as np


def _img(seed):
    rng = np.random.RandomState(seed)
    img = (rng.rand(220, 260, 3) * 255).astype(np.uint8)
    return cv2.GaussianBlur(img, (7, 7), 1.5).astype(np.float32)


def test_niqe_matches_reference_values():
    from edvr_tpu.metrics.niqe import calculate_niqe
    # golden values from basicsr.metrics.niqe on identical inputs
    rng = np.random.RandomState(0)
    goldens = [10.461553576333584, 10.034369644721169]
    for golden in goldens:
        img = (rng.rand(220, 260, 3) * 255).astype(np.uint8)
        img = cv2.GaussianBlur(img, (7, 7), 1.5).astype(np.float32)
        val = calculate_niqe(img, 0)
        assert abs(val - golden) < 1e-6, (val, golden)


def test_niqe_crop_and_gray():
    from edvr_tpu.metrics.niqe import calculate_niqe
    img = _img(3)
    v1 = calculate_niqe(img, 4)
    v2 = calculate_niqe(img, 0, convert_to='gray')
    assert np.isfinite(v1) and np.isfinite(v2)


def test_fid_zero_for_identical_gaussians():
    from edvr_tpu.metrics.fid import calculate_fid
    rng = np.random.RandomState(0)
    mu = rng.randn(16)
    a = rng.randn(16, 16)
    sigma = a @ a.T + np.eye(16)
    assert abs(calculate_fid(mu, sigma, mu.copy(), sigma.copy())) < 1e-6


def test_fid_known_value():
    from edvr_tpu.metrics.fid import calculate_fid
    # diagonal case has closed form: |dmu|^2 + sum((sqrt(s1)-sqrt(s2))^2)
    mu1 = np.zeros(4)
    mu2 = np.ones(4)
    s1 = np.diag([1., 4., 9., 16.])
    s2 = np.diag([1., 1., 1., 1.])
    expected = 4.0 + sum((np.sqrt(np.diag(s1)) - 1)**2)
    assert abs(calculate_fid(mu1, s1, mu2, s2) - expected) < 1e-6

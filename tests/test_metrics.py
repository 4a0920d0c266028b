"""PSNR/SSIM parity: host implementation vs cv2 (when available) and device
twins vs host. Reference: core/metrics.py:74-125."""

import numpy as np
import pytest

from sr3d_tpu.eval.metrics import (
    calculate_psnr,
    calculate_ssim,
    psnr_device,
    ssim_device,
)


@pytest.fixture(scope="module")
def img_pair(rng):
    a = rng.randint(0, 256, (48, 48, 3)).astype(np.float64)
    b = np.clip(a + rng.randn(48, 48, 3) * 12, 0, 255).round()
    return a, b


def test_psnr_identical_is_inf(img_pair):
    a, _ = img_pair
    assert calculate_psnr(a, a) == float("inf")


def test_psnr_known_value():
    a = np.zeros((8, 8))
    b = np.full((8, 8), 16.0)  # mse=256 → 20log10(255/16)
    assert calculate_psnr(a, b) == pytest.approx(20 * np.log10(255 / 16.0))


def test_ssim_bounds_and_self(img_pair):
    a, b = img_pair
    assert calculate_ssim(a, a) == pytest.approx(1.0)
    v = calculate_ssim(a, b)
    assert -1.0 <= v < 1.0


def test_ssim_matches_cv2_reference_formula(img_pair):
    """Replicate the exact reference ssim() with cv2 and compare."""
    cv2 = pytest.importorskip("cv2")
    a, b = img_pair
    a1, b1 = a[..., 0], b[..., 0]

    def ref_ssim(img1, img2):
        C1 = (0.01 * 255) ** 2
        C2 = (0.03 * 255) ** 2
        img1 = img1.astype(np.float64)
        img2 = img2.astype(np.float64)
        kernel = cv2.getGaussianKernel(11, 1.5)
        window = np.outer(kernel, kernel.transpose())
        mu1 = cv2.filter2D(img1, -1, window)[5:-5, 5:-5]
        mu2 = cv2.filter2D(img2, -1, window)[5:-5, 5:-5]
        mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
        s1 = cv2.filter2D(img1**2, -1, window)[5:-5, 5:-5] - mu1_sq
        s2 = cv2.filter2D(img2**2, -1, window)[5:-5, 5:-5] - mu2_sq
        s12 = cv2.filter2D(img1 * img2, -1, window)[5:-5, 5:-5] - mu1_mu2
        m = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / (
            (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
        return m.mean()

    from sr3d_tpu.eval.metrics import ssim
    assert ssim(a1, b1) == pytest.approx(ref_ssim(a1, b1), abs=1e-10)


def test_device_twins_match_host(img_pair):
    a, b = img_pair
    assert float(psnr_device(a, b)) == pytest.approx(calculate_psnr(a, b),
                                                     abs=1e-3)
    from sr3d_tpu.eval.metrics import ssim
    assert float(ssim_device(a, b)) == pytest.approx(ssim(a, b), abs=1e-4)


def test_ssim_shape_mismatch_raises(img_pair):
    a, _ = img_pair
    with pytest.raises(ValueError):
        calculate_ssim(a, a[:-1])

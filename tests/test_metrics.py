"""PSNR/SSIM sanity and invariants (no skimage available as referee;
properties + hand-computable cases instead)."""
import numpy as np

from pixelnerf_tpu.utils import metrics


def test_psnr_known_value():
    a = np.zeros((8, 8, 3))
    b = np.full((8, 8, 3), 0.1)
    # mse = 0.01 -> psnr = -10 log10(0.01) = 20
    assert abs(metrics.psnr(a, b) - 20.0) < 1e-9


def test_ssim_identity_is_one():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(32, 32, 3))
    assert abs(metrics.ssim(img, img) - 1.0) < 1e-9


def test_ssim_decreases_with_noise():
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(32, 32, 3))
    vals = [
        metrics.ssim(img, np.clip(img + rng.normal(0, s, img.shape), 0, 1))
        for s in (0.01, 0.05, 0.2)
    ]
    assert vals[0] > vals[1] > vals[2]
    assert vals[0] > 0.9


def test_ssim_constant_shift():
    """Uniform luminance shift lowers SSIM only via the luminance term."""
    img = np.full((16, 16), 0.5)
    shifted = np.full((16, 16), 0.6)
    v = metrics.ssim(img, shifted, multichannel=False)
    # analytic: variance terms are 0 -> S = (2*0.5*0.6 + C1)/(0.25+0.36+C1)
    C1 = 0.01**2
    expect = (2 * 0.5 * 0.6 + C1) / (0.5**2 + 0.6**2 + C1)
    assert abs(v - expect) < 1e-6


def test_ssim_grayscale_vs_multichannel():
    rng = np.random.default_rng(2)
    a = rng.uniform(size=(24, 24, 3))
    b = rng.uniform(size=(24, 24, 3))
    mc = metrics.ssim(a, b)
    per = np.mean([metrics.ssim(a[..., c], b[..., c], multichannel=False)
                   for c in range(3)])
    assert abs(mc - per) < 1e-12

"""Spectral-convergence metric unit tests."""

import numpy as np

from viai_tpu.signal import STFTConfig
from viai_tpu.utils.metrics import spectral_convergence

CFG = STFTConfig(n_fft=126, hop_length=32)


def test_identical_is_zero():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 2048)).astype(np.float32) * 0.1
    sc = np.asarray(spectral_convergence(x, x, CFG))
    assert sc.shape == (2,)
    np.testing.assert_allclose(sc, 0.0, atol=1e-6)


def test_scales_with_error():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 2048)).astype(np.float32) * 0.1
    small = x + 0.01 * rng.standard_normal(x.shape).astype(np.float32)
    big = x + 0.2 * rng.standard_normal(x.shape).astype(np.float32)
    sc_s = float(np.asarray(spectral_convergence(small, x, CFG))[0])
    sc_b = float(np.asarray(spectral_convergence(big, x, CFG))[0])
    assert 0.0 < sc_s < sc_b

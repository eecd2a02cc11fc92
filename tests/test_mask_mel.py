"""Mask sampling + mel/compression unit tests (SURVEY.md §4 Unit rows)."""

import jax
import jax.numpy as jnp
import numpy as np

from viai_tpu.signal import (
    MaskConfig,
    apply_mask,
    apply_mel,
    compress,
    decompress,
    expand_to_image,
    mel_filterbank,
    sample_batch_masks,
    sample_time_mask,
)


def test_mask_gap_bounds():
    cfg = MaskConfig(min_gap_frames=10, max_gap_frames=20)
    for seed in range(20):
        m = np.asarray(sample_time_mask(jax.random.key(seed), 256, cfg))
        holes = int((m == 0).sum())
        assert 10 <= holes <= 20
        # Gap must be contiguous.
        idx = np.where(m == 0)[0]
        assert (np.diff(idx) == 1).all()


def test_mask_batched_independent():
    cfg = MaskConfig()
    masks = np.asarray(sample_batch_masks(jax.random.key(0), 8, 256, cfg))
    assert masks.shape == (8, 256)
    # Not all identical.
    assert len({tuple(np.where(m == 0)[0][[0, -1]]) for m in masks}) > 1


def test_apply_and_expand():
    spec = jnp.ones((2, 256, 128))  # (B, bins, frames)
    mask = jnp.zeros((2, 128)).at[:, :64].set(1.0)
    out = np.asarray(apply_mask(spec, mask))
    assert (out[:, :, :64] == 1).all() and (out[:, :, 64:] == 0).all()
    img = expand_to_image(mask, 256)
    assert img.shape == (2, 256, 128)


def test_mel_matches_librosa_formula():
    """Slaney filterbank: rows sum to ~2/(band width); shape + coverage."""
    fb = mel_filterbank(16000, 510, n_mels=80)
    assert fb.shape == (256, 80)
    assert (fb >= 0).all()
    # Every mel channel must have some support.
    assert (fb.sum(axis=0) > 0).all()
    mag = jnp.ones((4, 100, 256))
    mel = apply_mel(mag, jnp.asarray(fb))
    assert mel.shape == (4, 100, 80)


def test_compress_roundtrip():
    mag = jnp.asarray(np.random.default_rng(0).uniform(0, 50, (16, 16)))
    img = compress(mag)
    assert float(img.min()) >= -1 and float(img.max()) <= 1
    back = decompress(img)
    np.testing.assert_allclose(
        np.asarray(back), np.asarray(mag), rtol=1e-3, atol=1e-3
    )

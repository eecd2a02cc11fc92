"""Vision-necessary av_cue corpus (round-2 VERDICT next-round #5).

The paper's core claim is that vision disambiguates audio inpainting;
the round-2 at-scale finding was fusion ≈ parity because the old
corpus' video was DERIVABLE from audio. av_cue is constructed so the
hole is exactly audio-ambiguous: these tests pin the ambiguity (no
observed STFT frame depends on the cue), the video cue, and the
mask/corpus alignment contract.
"""

import numpy as np
import pytest

from viai_tpu.data.synthetic import (
    AV_CUE_GAP,
    SyntheticAVDataset,
    SyntheticConfig,
    _render_av_cue_clip,
    _render_av_cue_video,
    av_cue_dropout_span,
)


def _scene_pair(idx=7, with_video=True):
    """Render the SAME scene with cue=0 and cue=1."""
    cfg = SyntheticConfig(with_video=with_video, style="av_cue")
    out = []
    for cue in (0, 1):
        rng = np.random.default_rng((0xA11D10, idx))
        t = np.arange(cfg.clip_samples) / cfg.sample_rate
        wav, scene, c = _render_av_cue_clip(rng, cfg, t, cue_override=cue)
        vid = _render_av_cue_video(cfg, scene, c, cfg.clip_samples)
        out.append((wav, scene, vid))
    return cfg, out


def test_audio_identical_outside_dropout_span():
    cfg, ((w0, scene, _), (w1, _, _)) = _scene_pair()
    s0, s1 = av_cue_dropout_span(cfg.sample_rate)
    np.testing.assert_array_equal(w0[:s0], w1[:s0])
    np.testing.assert_array_equal(w0[s1:], w1[s1:])
    assert np.abs(w0[s0:s1] - w1[s0:s1]).max() > 0.01  # differs inside


def test_no_observed_stft_frame_depends_on_cue():
    """THE ambiguity property: every STFT frame outside the masked gap
    has an identical magnitude spectrum for both continuations — an
    audio-only model cannot beat the two-hypothesis average."""
    import jax.numpy as jnp

    from viai_tpu.signal import STFTConfig, stft_magnitude

    cfg, ((w0, _, _), (w1, _, _)) = _scene_pair(idx=11)
    scfg = STFTConfig(n_fft=510, hop_length=128)
    m0 = np.asarray(stft_magnitude(jnp.asarray(w0)[None], scfg))[0]
    m1 = np.asarray(stft_magnitude(jnp.asarray(w1)[None], scfg))[0]
    g0, g1 = AV_CUE_GAP
    observed = np.r_[0:g0, g1:m0.shape[0]]
    np.testing.assert_allclose(m0[observed], m1[observed],
                               rtol=0, atol=1e-5)
    # ...and the in-gap frames DO differ (the task is non-trivial).
    assert np.abs(m0[g0:g1] - m1[g0:g1]).max() > 0.05


def test_video_reveals_the_cue_only_inside_gap():
    cfg, ((_, scene, v0), (_, _, v1)) = _scene_pair(idx=3)
    f0, f1 = v0["frames"], v1["frames"]
    n = cfg.clip_samples
    fidx = np.linspace(0, n - 1, cfg.video_frames).astype(int)
    in_gap = (fidx >= scene["s0"]) & (fidx < scene["s1"])
    assert in_gap.sum() >= 2, "gap must cover >=2 video frames"
    np.testing.assert_array_equal(f0[~in_gap], f1[~in_gap])
    assert np.abs(f0[in_gap] - f1[in_gap]).max() > 0.3


def test_dataset_mode_and_mask_pinning():
    from viai_tpu.config.options import TrainOptions
    from viai_tpu.data.loader import create_dataloader
    from viai_tpu.model import train_config_from_opt

    loader = create_dataloader("synthetic_av_cue", batch_size=4)
    b = next(iter(loader))
    assert b["wav"].shape == (4, 32000)
    assert b["frames"].shape[0] == 4 and b["frames_valid"].shape == (4,)
    loader.close()

    opt = TrainOptions().parse(
        ["--name", "cue", "--dataset_mode", "synthetic_av_cue",
         "--model", "av"], save=False)
    cfg = train_config_from_opt(opt)
    assert cfg.mask.fixed_start == AV_CUE_GAP[0]
    assert cfg.mask.min_gap_frames == cfg.mask.max_gap_frames \
        == AV_CUE_GAP[1] - AV_CUE_GAP[0]


def test_fixed_start_mask_sampling():
    import jax

    from viai_tpu.signal.mask import MaskConfig, sample_batch_masks

    cfg = MaskConfig(min_gap_frames=50, max_gap_frames=50,
                     fixed_start=AV_CUE_GAP[0])
    m = np.asarray(sample_batch_masks(jax.random.key(0), 8, 256, cfg))
    assert m.shape == (8, 256)
    expected = np.ones(256)
    expected[AV_CUE_GAP[0]:AV_CUE_GAP[1]] = 0.0
    for row in m:
        np.testing.assert_array_equal(row, expected)


def test_batch_iterator_matches_dataset_items():
    from viai_tpu.data.synthetic import SyntheticBatchIterator

    cfg = SyntheticConfig(with_video=True, style="av_cue")
    it = SyntheticBatchIterator(cfg, batch=3, seed=0)
    b = next(iter(it))
    it.close()
    ds = SyntheticAVDataset(cfg)
    for k in range(3):
        item = ds[k]
        np.testing.assert_array_equal(b["wav"][k], item["wav"])
        np.testing.assert_array_equal(b["frames"][k], item["frames"])


def test_normalization_is_cue_independent():
    """Per-clip max-normalization would leak the cue through observed-
    region LEVEL; the corpus uses a fixed scene-level scale."""
    for idx in range(5):
        _, ((w0, _, _), (w1, _, _)) = _scene_pair(idx=idx,
                                                  with_video=False)
        assert np.abs(w0).max() <= 0.5 + 1e-6
        s0, s1 = av_cue_dropout_span()
        np.testing.assert_array_equal(w0[:s0], w1[:s0])

"""Inference service tests: bucketing, external masks, hole compositing
(BASELINE.json config 4)."""

import numpy as np
from flax import nnx

from viai_tpu.testing import TINY_CFG, tiny_models, tone_batch
from viai_tpu.serving import InpaintService


def _service(buckets=(2, 4)):
    G, D, V = tiny_models()
    g_def, g_state = nnx.split(G)
    return InpaintService(
        g_def, g_state, TINY_CFG, buckets=buckets, gl_iters=2,
        clip_samples=4032,
    )


def test_inpaint_odd_batch_through_buckets():
    svc = _service()
    wavs = tone_batch(5, 4032)  # 5 → buckets 4 + 2(pad 1)
    out = svc.inpaint(wavs, gap_start_s=0.08, gap_end_s=0.12)
    assert out.shape == wavs.shape
    assert np.isfinite(out).all()
    assert svc.stats.clips == 5
    assert svc.stats.batches == 2
    assert svc.stats.padded_clips == 1
    assert svc.stats.clips_per_sec > 0


def test_observed_region_mask_semantics():
    svc = _service(buckets=(2,))
    masks = svc.time_mask_from_seconds(2, 0.08, 0.12)
    # Mask has a hole covering the gap frames and nothing else.
    hop = TINY_CFG.stft.hop_length
    f0, f1 = int(0.08 * 16000 / hop), int(np.ceil(0.12 * 16000 / hop))
    assert (masks[:, f0:f1] == 0).all()
    assert masks.sum() > masks.size * 0.5
    out = svc.inpaint(tone_batch(2, 4032), masks=masks)
    assert np.isfinite(out).all()


def test_streaming_submit_flush():
    svc = _service(buckets=(2, 4))
    masks = svc.time_mask_from_seconds(1, 0.08, 0.12)[0]
    for clip in tone_batch(3, 4032):
        svc.submit(clip, masks)
    outs = svc.flush()
    assert len(outs) == 3
    assert all(o.shape == (4032,) for o in outs)
    assert svc.flush() == []


def test_mesh_sharded_service():
    """DP serving: bucket batches sharded over the 8-device CPU mesh."""
    from viai_tpu.train import make_mesh

    G, D, V = tiny_models()
    g_def, g_state = nnx.split(G)
    mesh = make_mesh(8)
    svc = InpaintService(
        g_def, g_state, TINY_CFG, buckets=(8,), gl_iters=2,
        clip_samples=4032, mesh=mesh,
    )
    out = svc.inpaint(tone_batch(8, 4032), gap_start_s=0.08, gap_end_s=0.12)
    assert out.shape == (8, 4032)
    assert np.isfinite(out).all()


def test_inpaint_long_audio():
    """Long-audio chunked inpainting (SURVEY.md §5.7 overlap-add)."""
    svc = _service(buckets=(2, 4))
    t = np.arange(12000) / 16000.0
    wav = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    out = svc.inpaint_long(wav, gap_start_s=0.30, gap_end_s=0.40,
                           overlap_s=0.05)
    assert out.shape == wav.shape
    assert np.isfinite(out).all()
    # Regions far from the gap are untouched.
    np.testing.assert_array_equal(out[:1000], wav[:1000])
    np.testing.assert_array_equal(out[-1000:], wav[-1000:])


def test_multi_gap_mask():
    svc = _service(buckets=(2,))
    m = svc.time_mask_from_seconds(1, [0.02, 0.15], [0.05, 0.18])
    hop = TINY_CFG.stft.hop_length
    holes = np.where(m[0] == 0)[0]
    assert len(holes) > 0
    # Two disjoint runs.
    runs = np.split(holes, np.where(np.diff(holes) > 1)[0] + 1)
    assert len(runs) == 2
    del hop


def test_streaming_auto_flush_on_max_queue():
    """submit() returns Futures; queue auto-flushes at max_queue."""
    svc = _service(buckets=(2, 4)).configure_streaming(max_queue=2)
    masks = svc.time_mask_from_seconds(1, 0.08, 0.12)[0]
    clips = tone_batch(3, 4032)
    f0 = svc.submit(clips[0], masks)
    assert not f0.done()                      # below threshold
    f1 = svc.submit(clips[1], masks)          # hits max_queue → flush
    assert f0.done() and f1.done()
    assert f0.result().shape == (4032,)
    f2 = svc.submit(clips[2], masks)
    assert not f2.done()
    svc.flush()
    assert f2.done() and np.isfinite(f2.result()).all()


def test_streaming_auto_flush_on_deadline():
    """A timer flushes the queue flush_deadline_s after the first
    submit, with no further calls from the client."""
    import time

    svc = _service(buckets=(2,)).configure_streaming(
        flush_deadline_s=0.3)
    masks = svc.time_mask_from_seconds(1, 0.08, 0.12)[0]
    fut = svc.submit(tone_batch(1, 4032)[0], masks)
    assert not fut.done()
    out = fut.result(timeout=30)              # resolved by the timer
    assert out.shape == (4032,)
    # Timer is re-armed per batch: a second submit also auto-resolves.
    fut2 = svc.submit(tone_batch(1, 4032, seed=5)[0], masks)
    assert fut2.result(timeout=30).shape == (4032,)


def test_service_with_mag_refiner():
    """VERDICT r3 #7: the stage-2 refiner serves through InpaintService
    (magnitude domain: DDIM between G and GL)."""
    from viai_tpu.nn import define_R

    G, D, V = tiny_models()
    g_def, g_state = nnx.split(G)
    R = define_R(4, ngf=8, seed=5)
    r_def, r_state = nnx.split(R)
    svc = InpaintService(
        g_def, g_state, TINY_CFG, buckets=(2,), gl_iters=2,
        clip_samples=4032, refiner=(r_def, r_state),
        refine_steps=2, refine_t=0.3,
    )
    out = svc.inpaint(tone_batch(2, 4032), gap_start_s=0.08,
                      gap_end_s=0.12)
    assert out.shape == (2, 4032)
    assert np.isfinite(out).all()


def test_service_with_complex_refiner():
    """Complex-domain serving: GL-free decode — observed samples match
    the input to high accuracy (exact complex STFT kept verbatim)."""
    from viai_tpu.nn import define_R
    from viai_tpu.train.diffusion import complex_refiner_channels

    G, D, V = tiny_models()
    g_def, g_state = nnx.split(G)
    r_in, r_out = complex_refiner_channels(2)
    R = define_R(r_in, ngf=8, out_channels=r_out, seed=5)
    r_def, r_state = nnx.split(R)
    svc = InpaintService(
        g_def, g_state, TINY_CFG, buckets=(2,), clip_samples=4032,
        refiner=(r_def, r_state), refiner_domain="complex",
        refine_steps=3, refine_t=1.0,
    )
    wavs = tone_batch(2, 4032)
    out = svc.inpaint(wavs, gap_start_s=0.08, gap_end_s=0.12)
    assert out.shape == (2, 4032)
    assert np.isfinite(out).all()
    # Observed region (well away from the gap and clip edges).
    err = np.abs(out[:, 2600:3700] - wavs[:, 2600:3700]).max()
    assert err < 5e-3 * np.abs(wavs).max(), err


def test_ensemble_service():
    """Round-5 seed ensemble in the serving API: ensemble-of-self ==
    single service output (averaging a G with itself is the identity),
    and a genuine 2-G ensemble runs finite and differs."""
    G, D, V = tiny_models()
    g_def, g_state = nnx.split(G)
    G2, _, _ = tiny_models(seed=9)
    _, g_state2 = nnx.split(G2)
    kw = dict(buckets=(2,), gl_iters=2, clip_samples=4032)
    wavs = tone_batch(2, 4032)

    single = InpaintService(g_def, g_state, TINY_CFG, **kw)
    self_ens = InpaintService(g_def, g_state, TINY_CFG,
                              ensemble_states=[g_state], **kw)
    o1 = single.inpaint(wavs, gap_start_s=0.08, gap_end_s=0.12)
    o2 = self_ens.inpaint(wavs, gap_start_s=0.08, gap_end_s=0.12)
    # vmap+mean fuses differently than the plain apply (≈4e-5 float
    # noise, amplified through the chaotic GL map) — equivalence, not
    # bitwise equality, is the contract here.
    np.testing.assert_allclose(o1, o2, atol=1e-3)

    two = InpaintService(g_def, g_state, TINY_CFG,
                         ensemble_states=[g_state2], **kw)
    o3 = two.inpaint(wavs, gap_start_s=0.08, gap_end_s=0.12)
    assert np.isfinite(o3).all()
    assert np.abs(o3 - o1).max() > 0

"""Data pipeline tests: native decode, datasets, loader factory
(SURVEY.md §4 — designed from scratch; the reference has no tests)."""

import numpy as np
import pytest
import scipy.io.wavfile as wavfile

from viai_tpu.data import (
    AudioFolderDataset,
    SyntheticAVDataset,
    SyntheticConfig,
    create_dataloader,
    load_wav,
)


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    rng = np.random.default_rng(0)
    for i, sr in enumerate([16000, 22050, 8000]):
        x = (0.4 * np.sin(2 * np.pi * 330 * np.arange(sr * 3) / sr)).astype(
            np.float32
        )
        wavfile.write(d / f"clip{i}.wav", sr, (x * 32767).astype(np.int16))
    del rng
    return d


def test_load_wav_resamples(wav_dir):
    for f in sorted(wav_dir.iterdir()):
        wav = load_wav(str(f), 16000)
        assert wav.dtype == np.float32
        assert abs(len(wav) - 48000) < 32  # ~3 s at 16 kHz
        assert np.abs(wav).max() <= 1.0


def test_audio_folder_dataset(wav_dir):
    ds = AudioFolderDataset(str(wav_dir), clip_samples=16000)
    assert len(ds) == 3
    item = ds[0]
    assert item["wav"].shape == (16000,)
    # Deterministic per (seed, idx).
    np.testing.assert_array_equal(item["wav"], ds[0]["wav"])


def test_synthetic_dataset_deterministic():
    ds = SyntheticAVDataset(SyntheticConfig(with_video=True, video_frames=4,
                                            video_size=16))
    a, b = ds[7], ds[7]
    np.testing.assert_array_equal(a["wav"], b["wav"])
    assert a["wav"].shape == (32000,)
    assert a["frames"].shape == (4, 16, 16, 3)
    # Different indices give different clips.
    assert not np.allclose(ds[7]["wav"], ds[8]["wav"])


def test_native_loader_iterator(wav_dir):
    from viai_tpu import native

    if not native.AVAILABLE:
        pytest.skip("native lib unavailable")
    it = create_dataloader(
        "audio", str(wav_dir), batch_size=4, clip_samples=8000, n_threads=2
    )
    batch = next(iter(it))
    assert batch["wav"].shape == (4, 8000)
    assert np.isfinite(batch["wav"]).all()
    it.close()


def test_grain_synthetic_loader():
    it = create_dataloader(
        "synthetic", batch_size=4, clip_samples=32000, n_threads=0,
        num_epochs=1,
    )
    batch = next(iter(it))
    assert batch["wav"].shape == (4, 32000)


def test_grain_av_synthetic_loader():
    it = create_dataloader(
        "synthetic_av", batch_size=2, clip_samples=32000, n_threads=0,
        n_frames=4, frame_size=16, num_epochs=1,
    )
    batch = next(iter(it))
    assert batch["wav"].shape == (2, 32000)
    assert batch["frames"].shape == (2, 4, 16, 16, 3)


def test_native_decode_edge_cases():
    """Native decoder: float32 WAVs, stereo mixdown, bad buffers."""
    from viai_tpu import native

    if not native.AVAILABLE:
        pytest.skip("native lib unavailable")
    import io
    import struct

    # float32 stereo wav via scipy
    sr = 8000
    t = np.arange(sr) / sr
    stereo = np.stack(
        [np.sin(2 * np.pi * 220 * t), np.sin(2 * np.pi * 440 * t)], -1
    ).astype(np.float32)
    buf = io.BytesIO()
    wavfile.write(buf, sr, stereo)
    y, got_sr = native.decode_wav(buf.getvalue())
    assert got_sr == sr and y.shape == (sr,)
    np.testing.assert_allclose(y, stereo.mean(-1), atol=1e-6)

    # Garbage buffer → clean ValueError, not a crash.
    with pytest.raises(ValueError):
        native.decode_wav(b"not a wav file at all" * 10)
    # Truncated header.
    with pytest.raises(ValueError):
        native.decode_wav(b"RIFF\x00\x00\x00\x00WAVE")
    del struct


def _wav_bytes(fmt_tag, bits, sr, payload, extensible_sub=None):
    """Hand-rolled RIFF/WAVE container (mono) for format edge cases."""
    import struct

    if extensible_sub is not None:
        # fmt payload: standard 16 + cbSize(22) + validBits + chanMask
        # + SubFormat GUID (first 2 bytes = the real format code).
        guid = struct.pack("<H", extensible_sub) + b"\x00\x00" + bytes(12)
        fmt_payload = struct.pack(
            "<HHIIHHHHI", 0xFFFE, 1, sr, sr * bits // 8, bits // 8, bits,
            22, bits, 4,
        ) + guid
    else:
        fmt_payload = struct.pack(
            "<HHIIHH", fmt_tag, 1, sr, sr * bits // 8, bits // 8, bits
        )
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt_payload)) + fmt_payload
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    return b"RIFF" + len(chunks).to_bytes(4, "little") + b"WAVE" + chunks


def test_native_decode_extensible_float32():
    """WAVE_FORMAT_EXTENSIBLE float32 must decode via the SubFormat
    GUID, not be remapped to int32 PCM (ADVICE.md round-1 low #4)."""
    from viai_tpu import native

    if not native.AVAILABLE:
        pytest.skip("native lib unavailable")
    sr = 8000
    x = (0.5 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(
        np.float32)
    buf = _wav_bytes(None, 32, sr, x.tobytes(), extensible_sub=3)
    y, got_sr = native.decode_wav(buf)
    assert got_sr == sr
    np.testing.assert_allclose(y, x, atol=1e-6)
    # Extensible PCM16 also resolves via the GUID.
    x16 = (x * 32767).astype(np.int16)
    buf16 = _wav_bytes(None, 16, sr, x16.tobytes(), extensible_sub=1)
    y16, _ = native.decode_wav(buf16)
    np.testing.assert_allclose(y16, x16 / 32768.0, atol=1e-6)


def test_native_decode_8bit_full_length():
    """8-bit mono files must decode ALL samples (the old fl/2 buffer
    sizing truncated them to roughly half — ADVICE.md round-1 low #4).
    decode_wav sizes from python, but the loader path uses the C++
    buffer: pull a batch from a dataroot of one 8-bit file and check
    content from the file's second half shows up."""
    from viai_tpu import native

    if not native.AVAILABLE:
        pytest.skip("native lib unavailable")
    sr = 16000
    n = sr * 2
    # Silence in the first half, loud square wave in the second.
    x = np.zeros(n, np.float32)
    x[n // 2:] = 0.75
    pcm8 = ((x * 127) + 128).clip(0, 255).astype(np.uint8)
    buf = _wav_bytes(1, 8, sr, pcm8.tobytes())
    y, got_sr = native.decode_wav(buf)
    assert got_sr == sr and len(y) == n
    assert y[-1] > 0.5, "second half missing: 8-bit decode truncated"
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "a.wav")
        with open(p, "wb") as f:
            f.write(buf)
        L = native.NativeClipLoader([p], clip_samples=n, batch=2,
                                    n_workers=1, queue_depth=2, seed=0)
        try:
            b = L.next()
        finally:
            L.close()
        # The crop is the whole file; its second half must be loud.
        assert b[:, -100:].min() > 0.5, (
            "loader's C++ decode buffer truncated the 8-bit file"
        )


def test_native_loader_stress(wav_dir):
    """Sustained multi-worker pulls: no deadlock, no garbage batches."""
    from viai_tpu import native

    if not native.AVAILABLE:
        pytest.skip("native lib unavailable")
    paths = [str(p) for p in sorted(wav_dir.iterdir())
             if str(p).endswith(".wav")]
    L = native.NativeClipLoader(paths, clip_samples=4000, batch=8,
                                n_workers=4, queue_depth=4, seed=1)
    try:
        for _ in range(50):
            b = L.next()
            assert b.shape == (8, 4000)
            assert np.isfinite(b).all()
            assert np.abs(b).max() <= 1.0
    finally:
        L.close()


def test_synthetic_batch_iterator_matches_dataset():
    """Vectorized batch generator values == per-item dataset values."""
    from viai_tpu.data.synthetic import (
        SyntheticAVDataset, SyntheticBatchIterator, SyntheticConfig,
    )

    cfg = SyntheticConfig(clip_seconds=0.5, with_video=True,
                          video_frames=4, video_size=16,
                          video_dropout=0.3, size=64)
    it = SyntheticBatchIterator(cfg, batch=6, seed=0)
    batch = next(it)
    it.close()
    ds = SyntheticAVDataset(cfg)
    for b in range(6):
        ref = ds[b]
        np.testing.assert_allclose(batch["wav"][b], ref["wav"],
                                   atol=1e-6, rtol=1e-5)
        np.testing.assert_allclose(batch["frames"][b], ref["frames"],
                                   atol=1e-5, rtol=1e-4)
        assert batch["frames_valid"][b] == ref["frames_valid"]
    assert it.epoch_batches == 64 // 6


def test_synthetic_batch_iterator_throughput_and_advance():
    from viai_tpu.data.synthetic import (
        SyntheticBatchIterator, SyntheticConfig,
    )

    it = SyntheticBatchIterator(SyntheticConfig(clip_seconds=2.0),
                                batch=32)
    b1 = next(it)
    b2 = next(it)
    it.close()
    assert b1["wav"].shape == (32, 32000)
    assert not np.allclose(b1["wav"], b2["wav"])   # stream advances


def test_native_loader_single_worker_deterministic(wav_dir):
    """n_workers=1 → exact-reproducible batch stream (the documented
    determinism contract; VERDICT.md round-1 weak #7)."""
    from viai_tpu import native

    if not native.AVAILABLE:
        pytest.skip("native lib unavailable")
    paths = [str(p) for p in sorted(wav_dir.iterdir())
             if str(p).endswith(".wav")]

    def stream(seed):
        L = native.NativeClipLoader(paths, clip_samples=4000, batch=4,
                                    n_workers=1, queue_depth=2, seed=seed)
        try:
            return [L.next().copy() for _ in range(5)]
        finally:
            L.close()

    a, b = stream(7), stream(7)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    c = stream(8)
    assert any(not np.array_equal(x, y) for x, y in zip(a, c))


def test_synthetic_notes_style():
    """Polyphonic 'notes' corpus: deterministic, normalized, genuinely
    non-stationary (onsets → energy varies across the clip), and the
    batch iterator matches the dataset item-for-item."""
    from viai_tpu.data.synthetic import (
        SyntheticAVDataset, SyntheticBatchIterator, SyntheticConfig,
    )

    cfg = SyntheticConfig(style="notes", clip_seconds=1.0,
                          with_video=True, video_frames=4, video_size=16,
                          size=64)
    ds = SyntheticAVDataset(cfg)
    a, b = ds[3], ds[3]
    np.testing.assert_array_equal(a["wav"], b["wav"])
    assert a["wav"].shape == (16000,)
    assert np.abs(a["wav"]).max() <= 0.5 + 1e-6
    assert a["frames"].shape == (4, 16, 16, 3)
    # Non-stationarity: quarter-clip energies differ by >2x for most
    # clips (onset/decay structure; a steady sine would be ~equal).
    ratios = []
    for i in range(8):
        w = ds[i]["wav"]
        e = np.array([np.mean(w[k*4000:(k+1)*4000] ** 2) for k in range(4)])
        ratios.append(e.max() / max(e.min(), 1e-12))
    assert np.median(ratios) > 2.0, ratios

    it = SyntheticBatchIterator(cfg, batch=4, seed=0)
    batch = next(it)
    it.close()
    for k in range(4):
        np.testing.assert_array_equal(batch["wav"][k], ds[k]["wav"])
        np.testing.assert_array_equal(batch["frames"][k], ds[k]["frames"])


def test_synthetic_notes_loader_mode():
    from viai_tpu.data import create_dataloader

    it = create_dataloader("synthetic_notes", batch_size=2,
                           clip_samples=8000, n_threads=0)
    batch = next(iter(it))
    assert batch["wav"].shape == (2, 8000)
    if hasattr(it, "close"):
        it.close()
    it2 = create_dataloader("synthetic_av_notes", batch_size=2,
                            clip_samples=8000, n_threads=0, n_frames=4,
                            frame_size=16, num_epochs=1)
    b2 = next(iter(it2))
    assert b2["frames"].shape == (2, 4, 16, 16, 3)

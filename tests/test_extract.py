"""AVI container IO + dataset extraction tooling (VERDICT.md item #6).

End-to-end: generate a raw AV clip → mux to .avi → `prepare_dataset.py
extract` → manifest → load through the musices pipeline → one AV train
step. Completes SURVEY.md §2.1 "Dataset scripts".
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from viai_tpu.data.avi import read_avi, write_avi

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clip(seed=0, T=12, H=24, W=24, secs=3.0, sr=16000):
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, (T, H, W, 3), dtype=np.uint8)
    t = np.arange(int(secs * sr)) / sr
    audio = (0.4 * np.sin(2 * np.pi * rng.uniform(200, 600) * t)).astype(
        np.float32)
    return frames, audio, sr


def test_avi_roundtrip_bit_exact(tmp_path):
    frames, audio, sr = _clip()
    p = str(tmp_path / "clip.avi")
    write_avi(p, frames, fps=4, audio=audio, sr=sr)
    fr2, fps, au2, sr2 = read_avi(p)
    assert fps == 4 and sr2 == sr
    np.testing.assert_array_equal(fr2, frames)
    # PCM16 quantization only (write x32767, read /32768 → <2 LSB).
    assert np.abs(au2 - audio).max() < 2.0 / 32768


def test_avi_video_only_and_rejects_garbage(tmp_path):
    frames, _, _ = _clip(seed=1)
    p = str(tmp_path / "v.avi")
    write_avi(p, frames, fps=8)
    fr2, fps, audio, _ = read_avi(p)
    np.testing.assert_array_equal(fr2, frames)
    assert audio is None and fps == 8
    bad = str(tmp_path / "bad.avi")
    with open(bad, "wb") as f:
        f.write(b"RIFF\x00\x00\x00\x00GARB" + b"x" * 64)
    with pytest.raises(ValueError):
        read_avi(bad)


def test_load_frames_for_reads_raw_avi(tmp_path):
    """The AV dataset's video path must handle our raw AVIs without
    touching cv2 (whose ffmpeg crashes on raw DIB containers here)."""
    from viai_tpu.data.av import load_frames_for

    frames, audio, sr = _clip(seed=2)
    stem = str(tmp_path / "x")
    write_avi(stem + ".avi", frames, fps=4, audio=audio, sr=sr)
    out = load_frames_for(stem, n_frames=6, size=16)
    assert out.shape == (6, 16, 16, 3)
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_extract_to_train_e2e(tmp_path):
    """raw videos → extract → manifest → musices loader → AV train step."""
    raw = tmp_path / "raw"
    data = tmp_path / "data"
    raw.mkdir()
    for i in range(3):
        frames, audio, sr = _clip(seed=i)
        write_avi(str(raw / f"vid{i}.avi"), frames, fps=4, audio=audio,
                  sr=sr)
    script = os.path.join(REPO, "scripts", "prepare_dataset.py")
    r = subprocess.run(
        [sys.executable, script, "extract", "--root", str(raw),
         "--out", str(data), "--n_frames", "4", "--frame_size", "16",
         "--require_audio"],
        capture_output=True, text=True, cwd=REPO, timeout=240,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "extracted 3 clips (audio+frames)" in r.stdout, r.stdout
    r = subprocess.run(
        [sys.executable, script, "manifest", "--root", str(data),
         "--train_frac", "0.7"],
        capture_output=True, text=True, cwd=REPO, timeout=120,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    manifest = json.load(open(data / "MUSICES.json"))
    assert len(manifest["train"]) == 2 and len(manifest["test"]) == 1
    assert all("frames" in e for e in manifest["train"])

    # Load through the real pipeline and take one AV train step.
    import jax
    import jax.numpy as jnp

    from viai_tpu.data import create_dataloader
    from viai_tpu.testing import TINY_CFG, tiny_models
    from viai_tpu.train import TrainConfig, adam, init_state, make_train_step

    loader = create_dataloader(
        "musices", str(data / "MUSICES.json"), batch_size=2,
        clip_samples=4032, n_threads=0, n_frames=4, frame_size=16,
        num_epochs=1,
    )
    batch = next(iter(loader))
    assert batch["wav"].shape == (2, 4032)
    assert batch["frames"].shape == (2, 4, 16, 16, 3)

    G, D, V = tiny_models(use_video=True)
    cfg = TrainConfig(**{**TINY_CFG.__dict__, "use_video": True})
    g_tx, d_tx = adam(2e-4), adam(2e-4)
    (g_def, d_def, v_def), state = init_state(G, D, V, g_tx, d_tx)
    step = make_train_step(g_def, d_def, v_def, g_tx, d_tx, cfg)
    frames8 = jnp.asarray(np.repeat(batch["frames"], 2, axis=1))  # T=4→8
    state, metrics = step(state, jnp.asarray(batch["wav"]), frames8,
                          jax.random.key(0))
    assert np.isfinite(float(metrics["loss_G"]))


def test_download_plan_construction(tmp_path):
    """The download subcommand's yt-dlp/ffmpeg plan (the only part
    testable in this offline image — SURVEY.md §2.1 last row)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "prepare_dataset",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "prepare_dataset.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    manifest = {
        "train": ["abc123", {"id": "def456", "start": 3.0, "end": 9.5}],
        "test": [{"ytid": "ghi789"}],
    }
    cmds = mod.download_commands(manifest, "/data", fmt="mp4")
    assert [c[0] for c in cmds] == ["yt-dlp", "yt-dlp", "ffmpeg", "yt-dlp"]
    assert cmds[0][-1].endswith("watch?v=abc123")
    assert "/data/def456.mp4" in cmds[1]
    trim = cmds[2]
    assert trim[trim.index("-ss") + 1] == "3.0"
    assert trim[trim.index("-to") + 1] == "9.5"
    assert "/data/def456_trim.mp4" in trim
    # Flat-list manifests work too.
    assert len(mod.download_commands(["x"], "/d")) == 1


def test_download_dry_run_cli(tmp_path, capsys):
    import json as _json
    import subprocess
    import sys as _sys

    mf = tmp_path / "m.json"
    mf.write_text(_json.dumps(["vidA", "vidB"]))
    r = subprocess.run(
        [_sys.executable,
         os.path.join(os.path.dirname(__file__), "..", "scripts",
                      "prepare_dataset.py"),
         "download", "--manifest", str(mf), "--out", str(tmp_path),
         "--dry_run"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    assert "vidA" in r.stdout and "2 commands (dry run)" in r.stdout

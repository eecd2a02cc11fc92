"""Visualizer artifact tests (L7): loss logs, PNG/WAV writers, galleries."""

import json
import os

import numpy as np

from viai_tpu.utils.visualizer import (
    HTMLGallery,
    Visualizer,
    spec_to_png,
    write_wav,
)


def test_loss_logging(tmp_path):
    v = Visualizer(str(tmp_path), "t")
    v.print_current_losses(1, 5, {"loss_G": 1.25, "loss_D": 0.5}, 0.1)
    txt = open(tmp_path / "loss_log.txt").read()
    assert "loss_G: 1.2500" in txt and "epoch: 1" in txt
    rec = json.loads(open(tmp_path / "loss_log.jsonl").readline())
    assert rec["loss_D"] == 0.5


def test_png_and_wav_writers(tmp_path):
    spec_to_png(np.random.default_rng(0).uniform(0, 1, (32, 32)),
                str(tmp_path / "s.png"))
    from PIL import Image

    img = Image.open(tmp_path / "s.png")
    assert img.size == (32, 32)
    wav = 0.5 * np.sin(np.linspace(0, 100, 8000))
    write_wav(str(tmp_path / "a.wav"), wav, 16000)
    from viai_tpu.data import load_wav

    back = load_wav(str(tmp_path / "a.wav"), 16000)
    np.testing.assert_allclose(back, wav, atol=1e-3)


def test_gallery(tmp_path):
    g = HTMLGallery(str(tmp_path / "res"), "demo")
    g.add_result(
        0,
        specs={"real": np.zeros((16, 16)), "fake": np.ones((16, 16))},
        wavs={"out": np.zeros(1000, np.float32)},
        metrics={"PSNR": 30.0},
    )
    path = g.save()
    html = open(path).read()
    assert "00000_real.png" in html and "00000_out.wav" in html
    assert "PSNR=30.00" in html


def test_display_current_results(tmp_path):
    v = Visualizer(str(tmp_path), "t")
    v.display_current_results({"real": np.zeros((8, 8))}, epoch=3)
    assert os.path.exists(tmp_path / "web" / "images" /
                          "epoch003_real.png")
    assert os.path.exists(tmp_path / "web" / "index.html")


def test_tensorboard_tier(tmp_path):
    """--tensorboard writes clu event files; absence degrades cleanly."""
    from viai_tpu.utils.visualizer import Visualizer

    v = Visualizer(str(tmp_path), "tb_test", tensorboard=True)
    v.print_current_losses(1, 0, {"loss_G": 1.0, "loss_D": 0.5}, 0.1)
    v.print_current_losses(1, 1, {"loss_G": 0.9, "loss_D": 0.6}, 0.1)
    import os

    tb_dir = tmp_path / "tb"
    if v._tb is not None:   # clu+tf present in this image
        files = os.listdir(tb_dir)
        assert any("tfevents" in f for f in files), files
    # txt/JSONL tiers unaffected either way.
    assert (tmp_path / "loss_log.jsonl").exists()

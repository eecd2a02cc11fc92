"""End-to-end CLI test: train.py → checkpoints → test.py → gallery.

Exercises the reference's full user workflow (SURVEY.md §3.1/§3.2) on a
tiny CPU-runnable config (SURVEY.md §7.2 — config 1 is CPU-runnable).
"""

import json
import os

from viai_tpu.cli.test import main as infer_main
from viai_tpu.cli.train import main as train_main

TINY = [
    "--dataset_mode", "synthetic",
    "--model", "audio",
    "--batchSize", "2",
    "--nThreads", "0",
    "--clip_seconds", "0.252",     # 4032 samples → 64 frames at hop 64
    "--n_fft", "126",              # 64 bins
    "--hop_length", "64",
    "--image_frames", "64",
    "--ngf", "8", "--ndf", "8",
    "--min_gap_frames", "8", "--max_gap_frames", "16",
    "--gl_iters", "2",
    "--n_data_devices", "2",       # batchSize must divide the data axis
]


def test_train_then_test_cli(tmp_path):
    ckpt = str(tmp_path / "ckpts")
    args = TINY + [
        "--name", "e2e",
        "--checkpoints_dir", ckpt,
        "--niter", "1", "--niter_decay", "0",
        "--steps_per_epoch", "3",
        "--save_epoch_freq", "1",
        "--lr_policy", "constant",
        "--print_freq", "1",
    ]
    train_main(args)
    expr = os.path.join(ckpt, "e2e")
    # Reference artifacts: opt.txt, loss_log.txt, per-net checkpoints.
    assert os.path.exists(os.path.join(expr, "opt.txt"))
    assert os.path.exists(os.path.join(expr, "loss_log.txt"))
    assert os.path.exists(os.path.join(expr, "1_net_G.pth"))
    assert os.path.exists(os.path.join(expr, "latest_net_G.pth"))
    assert os.path.exists(os.path.join(expr, "latest_net_D.pth"))
    # Losses were logged as JSONL too.
    with open(os.path.join(expr, "loss_log.jsonl")) as f:
        rec = json.loads(f.readline())
    assert "loss_G" in rec and "loss_D" in rec

    results = str(tmp_path / "results")
    targs = TINY + [
        "--name", "e2e",
        "--checkpoints_dir", ckpt,
        "--results_dir", results,
        "--which_epoch", "latest",
        "--how_many", "2",
    ]
    summary = infer_main(targs)
    assert summary["n"] == 2
    assert summary["psnr_mean"] > 0
    idx = os.path.join(results, "e2e", "test_latest", "index.html")
    assert os.path.exists(idx)
    # Gallery contains images + wavs.
    imgs = os.listdir(os.path.join(results, "e2e", "test_latest", "images"))
    assert any(f.endswith(".png") for f in imgs)
    assert any(f.endswith(".wav") for f in imgs)


def test_train_av_cli(tmp_path):
    """Vision-infused model end-to-end through the CLI (tiny config)."""
    ckpt = str(tmp_path / "ckpts_av")
    args = [
        "--dataset_mode", "synthetic_av",
        "--model", "av",
        "--batchSize", "2",
        "--nThreads", "0",
        "--clip_seconds", "0.252",
        "--n_fft", "126",
        "--hop_length", "64",
        "--image_frames", "64",
        "--ngf", "8", "--ndf", "8",
        "--fusion_channels", "16",
        "--n_video_frames", "4", "--frame_size", "16",
        "--min_gap_frames", "8", "--max_gap_frames", "16",
        "--gl_iters", "2",
        "--n_data_devices", "2",
        "--name", "e2e_av",
        "--checkpoints_dir", ckpt,
        "--niter", "1", "--niter_decay", "0",
        "--steps_per_epoch", "2",
        "--save_epoch_freq", "1",
        "--lr_policy", "constant",
        "--print_freq", "1",
        "--no_html",
    ]
    train_main(args)
    expr = os.path.join(ckpt, "e2e_av")
    # The AV model saves all three nets.
    assert os.path.exists(os.path.join(expr, "latest_net_G.pth"))
    assert os.path.exists(os.path.join(expr, "latest_net_D.pth"))
    assert os.path.exists(os.path.join(expr, "latest_net_V.pth"))


def test_continue_train_cli(tmp_path):
    """--continue_train resumes from the saved orbax state (step count
    advances rather than restarting) — the reference resume contract."""
    ckpt = str(tmp_path / "ckpts_ct")
    base = TINY + [
        "--name", "ct",
        "--checkpoints_dir", ckpt,
        "--niter", "1", "--niter_decay", "0",
        "--steps_per_epoch", "2",
        "--save_epoch_freq", "1",
        "--lr_policy", "constant",
        "--print_freq", "10",
        "--no_html",
    ]
    m1 = train_main(base)
    assert int(m1.state["step"]) == 2
    m2 = train_main(base + ["--continue_train", "--which_epoch", "latest"])
    # Resumed from step 2 and ran 2 more.
    assert int(m2.state["step"]) == 4


def test_ensemble_eval_cli(tmp_path):
    """Round-5 seed-ensemble (--ensemble_names): two independently
    seeded tiny runs, evaluated (a) singly and (b) ensembled. Pins the
    exact identity ensemble(e5a, e5a) == single(e5a) — averaging a G
    with itself is the identity in compressed-mag space, so the whole
    stacked-vmap path must reproduce the single-G chain bitwise-modulo-
    float — and that a genuine 2-G ensemble runs finite and differs."""
    ckpt = str(tmp_path / "ckpts")
    for name, seed in (("e5a", "1"), ("e5b", "7")):
        train_main(TINY + [
            "--name", name, "--checkpoints_dir", ckpt, "--seed", seed,
            "--niter", "1", "--niter_decay", "0", "--steps_per_epoch", "2",
            "--save_epoch_freq", "1", "--lr_policy", "constant",
            "--print_freq", "1",
        ])
    results = str(tmp_path / "results")
    base = TINY + [
        "--checkpoints_dir", ckpt, "--results_dir", results,
        "--which_epoch", "latest", "--how_many", "2",
    ]
    single = infer_main(base + ["--name", "e5a"])
    self_ens = infer_main(base + ["--name", "e5a",
                                  "--ensemble_names", "e5a"])
    assert abs(single["hole_psnr_mean"] - self_ens["hole_psnr_mean"]) < 1e-3
    assert abs(single["psnr_mean"] - self_ens["psnr_mean"]) < 1e-3
    two = infer_main(base + ["--name", "e5a", "--ensemble_names", "e5b"])
    assert two["n"] == 2
    import numpy as np
    assert np.isfinite(two["hole_psnr_mean"])
    assert abs(two["hole_psnr_mean"] - single["hole_psnr_mean"]) > 1e-6


def test_paired_delta_script(tmp_path):
    """scripts/paired_delta.py: per-clip logs from two matched-seed
    eval arms zip into a paired delta; identical arms give exactly 0."""
    import subprocess
    import sys

    ckpt = str(tmp_path / "ckpts")
    train_main(TINY + [
        "--name", "pd", "--checkpoints_dir", ckpt,
        "--niter", "1", "--niter_decay", "0", "--steps_per_epoch", "2",
        "--save_epoch_freq", "1", "--lr_policy", "constant",
        "--print_freq", "1",
    ])
    results = str(tmp_path / "results")
    base = TINY + [
        "--name", "pd", "--checkpoints_dir", ckpt,
        "--results_dir", results, "--which_epoch", "latest",
        "--how_many", "2",
    ]
    # Two runs of the SAME arm — the paired delta must be exactly 0 —
    # plus one at different gl_iters, which must differ per-clip.
    # VIAI_RESULTS_JSONL keeps the records out of the repo's durable
    # quality_results.jsonl (a test must never pollute — or tempt a
    # cleanup of — the real experiment log).
    jsonl = str(tmp_path / "results.jsonl")
    os.environ["VIAI_RESULTS_JSONL"] = jsonl
    try:
        infer_main(base + ["--log_results", "pd_a"])
        infer_main(base + ["--log_results", "pd_a2"])
        infer_main(base + ["--gl_iters", "1", "--log_results", "pd_b"])
    finally:
        del os.environ["VIAI_RESULTS_JSONL"]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "paired_delta.py"),
         "pd_a", "pd_a2", "--jsonl", jsonl],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    assert "+0.000 ±" in out.stdout and "no separation" in out.stdout
    out2 = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "paired_delta.py"),
         "pd_a", "pd_b", "--jsonl", jsonl],
        capture_output=True, text=True)
    assert out2.returncode == 0, out2.stderr
    assert "paired delta" in out2.stdout


def test_ensemble_refiner_composition_cli(tmp_path):
    """Round-5 queue-6 path: --ensemble_names composed with --refiner.
    make_infer_fn feeds the ensemble MEAN to R (train/step.py ~503), so
    with --refine_mix 1.0 the convex mix returns exactly the ensemble-G
    hole — the composed chain must reproduce the pure-ensemble chain —
    and with mix 0 the ensemble-conditioned refiner runs finite."""
    from flax import nnx

    from viai_tpu.io import save_networks
    from viai_tpu.nn import define_R

    ckpt = str(tmp_path / "ckpts")
    for name, seed in (("e6a", "1"), ("e6b", "7")):
        train_main(TINY + [
            "--name", name, "--checkpoints_dir", ckpt, "--seed", seed,
            "--niter", "1", "--niter_decay", "0", "--steps_per_epoch", "2",
            "--save_epoch_freq", "1", "--lr_policy", "constant",
            "--print_freq", "1",
        ])
    # Init-weight R checkpoint in the primary run's dir.
    R = define_R(4, ngf=8, seed=3)
    _, r_state = nnx.split(R)
    save_networks({"R": r_state}, "latest", os.path.join(ckpt, "e6a"),
                  also_latest=False)

    base = TINY + [
        "--name", "e6a", "--ensemble_names", "e6b",
        "--checkpoints_dir", ckpt,
        "--results_dir", str(tmp_path / "res"),
        "--which_epoch", "latest", "--how_many", "2",
    ]
    pure = infer_main(base)
    rkw = ["--refiner", "--rngf", "8", "--refine_steps", "2",
           "--refine_t", "0.2"]
    mixed_out = infer_main(base + rkw + ["--refine_mix", "1.0"])
    assert abs(pure["hole_psnr_mean"] - mixed_out["hole_psnr_mean"]) < 1e-3
    assert abs(pure["psnr_mean"] - mixed_out["psnr_mean"]) < 1e-3
    refined = infer_main(base + rkw)
    import numpy as np
    assert np.isfinite(refined["hole_psnr_mean"])


def test_analyze_r5_paired_verdicts(tmp_path):
    """scripts/analyze_r5.py: the round-5 consolidator ranks tags per
    queue and emits paired per-clip z-verdicts; newest-wins when a tag
    was re-run (queue 8 reuses queue-5/6 tags after the checkpoint
    wipe), and a >2σ paired delta reads A>B."""
    import subprocess
    import sys

    clips_b = [30.0, 40.0, 50.0, 60.0]
    # Paired deltas +0.4/+0.5/+0.6/+0.5 → mean +0.5, sem ~0.04, z >> 2.
    clips_a = [30.4, 40.5, 50.6, 60.5]
    stale_b = [0.0, 0.0, 0.0, 0.0]  # must lose newest-wins

    def row(tag, clips, t):
        return {"exp": "test_eval", "tag": tag, "n": len(clips),
                "hole_psnr_mean": sum(clips) / len(clips),
                "hole_psnr_sem": 1.0, "snr_mean": 1.0, "snr_sem": 0.1,
                "spec_conv_mean": 0.1, "t": t,
                "hole_psnr_clips": clips}

    jsonl = tmp_path / "q.jsonl"
    jsonl.write_text("\n".join(json.dumps(r) for r in [
        row("r5q5_control_clips", stale_b, 1.0),   # pre-reboot, stale
        row("r5q5_control_clips", clips_b, 2.0),   # queue-8 rerun
        row("r5q8_ens3_n64", clips_a, 2.0),
    ]) + "\n")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "analyze_r5.py"),
         "--jsonl", str(jsonl)],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    assert "queue8 (post-reboot retrained replicas" in out.stdout
    line = [ln for ln in out.stdout.splitlines()
            if ln.startswith("- r5q8_ens3_n64 vs r5q5_control_clips")]
    assert len(line) == 1
    # Newest-wins: pairing vs the stale all-zero control would read
    # +45.375; the rerun control gives exactly +0.500 and A>B.
    assert "+0.500 ±" in line[0] and "A>B" in line[0]
    # Arms not present degrade to an explicit (missing arm) note.
    assert "(missing arm)" in out.stdout


def test_eval_caps_at_how_many_with_partial_batch(tmp_path):
    """--how_many that batchSize doesn't divide: the summary mean/SEM
    and the per-clip record must cover exactly how_many clips, not the
    whole final batch (a 40-batch arm claiming n=64 over 80 clips
    would silently break pairing against a 16-batch arm)."""
    ckpt = str(tmp_path / "ckpts")
    train_main(TINY + [
        "--name", "cap", "--checkpoints_dir", ckpt,
        "--niter", "1", "--niter_decay", "0", "--steps_per_epoch", "2",
        "--save_epoch_freq", "1", "--lr_policy", "constant",
        "--print_freq", "1",
    ])
    jsonl = str(tmp_path / "cap.jsonl")
    os.environ["VIAI_RESULTS_JSONL"] = jsonl
    try:
        summary = infer_main(TINY + [
            "--name", "cap", "--checkpoints_dir", ckpt,
            "--results_dir", str(tmp_path / "res"),
            "--which_epoch", "latest", "--how_many", "3",
            "--log_results", "cap3",
        ])
    finally:
        del os.environ["VIAI_RESULTS_JSONL"]
    assert summary["n"] == 3
    rec = json.loads(open(jsonl).readline())
    assert len(rec["hole_psnr_clips"]) == 3
    # Pairing provenance recorded (seed drives the mask stream).
    assert rec["seed"] == 0 and rec["batchSize"] == 2
    assert rec["how_many"] == 3


def test_paired_tools_reject_mismatched_seeds(tmp_path):
    """Records from different eval seeds are different mask streams:
    paired_delta.py must refuse, analyze_r5.py must mark UNPAIRABLE."""
    import subprocess
    import sys

    def row(tag, seed, t):
        return {"exp": "test_eval", "tag": tag, "n": 2, "seed": seed,
                "dataset_mode": "synthetic", "hole_psnr_mean": 1.0,
                "hole_psnr_sem": 1.0, "snr_mean": 1.0, "snr_sem": 0.1,
                "spec_conv_mean": 0.1, "t": t,
                "hole_psnr_clips": [30.0, 40.0]}

    jsonl = tmp_path / "seeds.jsonl"
    jsonl.write_text("\n".join(json.dumps(r) for r in [
        row("r5q5_control_clips", 0, 1.0),
        row("r5q5_mix07_clips", 11, 1.0),
    ]) + "\n")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "paired_delta.py"),
         "r5q5_mix07_clips", "r5q5_control_clips", "--jsonl", str(jsonl)],
        capture_output=True, text=True)
    assert out.returncode != 0
    assert "not paired" in (out.stdout + out.stderr)
    out2 = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "analyze_r5.py"),
         "--jsonl", str(jsonl)],
        capture_output=True, text=True)
    assert out2.returncode == 0, out2.stderr
    line = [ln for ln in out2.stdout.splitlines()
            if ln.startswith("- r5q5_mix07_clips vs r5q5_control_clips")]
    assert len(line) == 1 and "UNPAIRABLE" in line[0]

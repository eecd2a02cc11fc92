"""test.py — mirrors the reference inference entry point.

Reference call stack (SURVEY.md §3.2): load checkpoint → loop eval set
→ model.test() (no-grad G forward + Griffin-Lim) → PSNR/SNR vs ground
truth → save spectrogram images + wavs + HTML gallery.

The whole inpaint+GL chain runs as one jit'd device program; the host
only writes result artifacts (BASELINE.json metric chain, [B:2]).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config.options import TestOptions
from ..data import create_dataloader
from ..model import create_model
from ..signal import stft_magnitude
from ..train.step import preprocess
from ..utils.metrics import (masked_psnr, psnr, snr,
                             spectral_convergence)
from ..utils.visualizer import HTMLGallery


def main(args=None):
    from ..utils.compile_cache import enable as _enable_cache

    _enable_cache()

    def _honor_gpu_ids(opt):
        # Reference semantic: --gpu_ids -1 means CPU.
        if getattr(opt, "gpu_ids", "0") == "-1":
            import jax

            try:
                jax.config.update("jax_platforms", "cpu")
            except Exception:
                pass

    opt = TestOptions().parse(args)
    _honor_gpu_ids(opt)
    clip_samples = int(opt.sample_rate * opt.clip_seconds)
    loader = create_dataloader(
        opt.dataset_mode, opt.dataroot, opt.batchSize, clip_samples,
        opt.sample_rate, opt.nThreads, opt.n_video_frames, opt.frame_size,
        seed=opt.seed, shuffle=False, num_epochs=1, prefer_native=False,
        split=getattr(opt, "phase", "test"),
    )
    opt.isTrain = False
    model = create_model(opt)
    model.load_networks(opt.which_epoch)

    # --eval_samples K > 1: best-of-K posterior sampling (refiner only —
    # the G+GL chain is deterministic given the mask). Each sample is
    # the SAME inpainting task under a decoupled refiner-noise stream;
    # per-clip the best hole-PSNR sample is kept. The gap between
    # best-of-K and single-sample separates "the diffusion model can't
    # represent the posterior" from "mean-PSNR punishes sampling from a
    # multimodal posterior" (round-4 attribution arm).
    n_samples = int(getattr(opt, "eval_samples", 1))
    if n_samples > 1 and model.r_def is None:
        print("[test] --eval_samples needs --refiner (chain is "
              "deterministic without it); falling back to 1 sample")
        n_samples = 1
    infer_fns = [model.infer_fn]
    if n_samples > 1:
        infer_fns += [model._build_infer_fn(noise_fold=s)
                      for s in range(1, n_samples)]

    results_dir = os.path.join(
        opt.results_dir, opt.name, f"{opt.phase}_{opt.which_epoch}"
    )
    gallery = HTMLGallery(results_dir, f"{opt.name} — epoch {opt.which_epoch}")

    all_psnr, all_hole_psnr, all_snr, all_sc = [], [], [], []
    all_hole_psnr_s1 = []   # first-sample hole-PSNR (best-of-K runs)
    n_done = 0
    key = jax.random.key(opt.seed)
    for batch in loader:
        if n_done >= opt.how_many:
            break
        key, kmask, kgl = jax.random.split(key, 3)
        model.set_input(batch)
        wav_in = model._input["wav"]
        # Metrics: spectrogram PSNR (full + hole-only) and waveform SNR.
        pre = preprocess(wav_in, kmask, model.cfg)
        in_mag = stft_magnitude(wav_in, model.cfg.stft)
        from ..signal.mel import compress

        in_img = compress(jnp.swapaxes(in_mag, -1, -2))[..., None]
        n_fr = in_img.shape[2]
        m = pre["mask_img"][:, :, :n_fr]

        cand = []   # per sample: (hole, psnr, snr, sc, wav, img)
        for fn in infer_fns:
            out_wav = fn(
                model.state["g"], model.state["v"], wav_in, kmask,
                model._input["frames"],
            )
            out_mag = stft_magnitude(out_wav, model.cfg.stft)
            out_img = compress(jnp.swapaxes(out_mag, -1, -2))[..., None]
            cand.append((
                np.asarray(masked_psnr(out_img, in_img, m)),
                np.asarray(psnr(out_img, in_img)),
                np.asarray(snr(out_wav, wav_in)),
                np.asarray(spectral_convergence(out_wav, wav_in,
                                                model.cfg.stft)),
                out_wav, out_img,
            ))
        if len(cand) == 1:
            b_hole, b_psnr, b_snr, b_sc, out_wav, out_img = cand[0]
        else:
            holes = np.stack([c[0] for c in cand])       # (S, B)
            best = holes.argmax(axis=0)                  # (B,)
            pick = lambda i: np.stack(
                [np.asarray(cand[best[b]][i])[b]
                 for b in range(holes.shape[1])])
            b_hole, b_psnr, b_snr, b_sc = (pick(0), pick(1), pick(2),
                                           pick(3))
            out_wav, out_img = pick(4), pick(5)
            all_hole_psnr_s1 += list(holes[0])
        all_psnr += list(b_psnr)
        all_hole_psnr += list(b_hole)
        all_snr += list(b_snr)
        all_sc += list(b_sc)

        wav_np = np.asarray(wav_in)
        out_np = np.asarray(out_wav)
        real_img = np.asarray(pre["real_img"])
        masked_img = np.asarray(pre["masked_img"])
        fake_full = np.asarray(out_img)
        for b in range(min(wav_np.shape[0], opt.how_many - n_done)):
            gallery.add_result(
                n_done,
                specs={
                    "real": (real_img[b, :, :, 0] + 1) / 2,
                    "masked": (masked_img[b, :, :, 0] + 1) / 2,
                    "inpainted": (fake_full[b, :, :, 0] + 1) / 2,
                },
                wavs={"real": wav_np[b], "inpainted": out_np[b]},
                metrics={
                    "PSNR": float(b_psnr[b]),
                    "holePSNR": float(b_hole[b]),
                    "SNR": float(b_snr[b]),
                    "specConv": float(b_sc[b]),
                },
                sr=opt.sample_rate,
            )
            n_done += 1

    path = gallery.save()
    summary = {
        "n": n_done,
        "psnr_mean": float(np.mean(all_psnr)) if all_psnr else float("nan"),
        "hole_psnr_mean": (
            float(np.mean(all_hole_psnr)) if all_hole_psnr else float("nan")
        ),
        "snr_mean": float(np.mean(all_snr)) if all_snr else float("nan"),
        "spec_conv_mean": float(np.mean(all_sc)) if all_sc else float("nan"),
    }
    if n_samples > 1:
        summary["eval_samples"] = n_samples
        summary["hole_psnr_s1_mean"] = (
            float(np.mean(all_hole_psnr_s1)) if all_hole_psnr_s1
            else float("nan"))
    print(f"results → {path}")
    print(
        f"PSNR {summary['psnr_mean']:.2f} dB | hole-PSNR "
        f"{summary['hole_psnr_mean']:.2f} dB | SNR {summary['snr_mean']:.2f} dB "
        f"| specConv {summary['spec_conv_mean']:.4f} ({n_done} clips)"
    )
    if getattr(opt, "log_results", ""):
        # Durable eval record (ADVICE r3: /tmp wipes killed two queue
        # runs' results — append the summary where git can keep it:
        # scripts/quality_results.jsonl in the repo).
        import json as _json
        import time as _time

        rec = {"exp": "test_eval", "tag": opt.log_results,
               "name": opt.name, "which_epoch": opt.which_epoch,
               "dataset_mode": opt.dataset_mode, **summary,
               "t": _time.time()}
        out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))),
            "scripts", "quality_results.jsonl")
        with open(out, "a") as f:
            f.write(_json.dumps(rec) + "\n")
    return summary


if __name__ == "__main__":
    main()

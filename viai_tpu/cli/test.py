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
    # the SAME inpainting task under a decoupled refiner-noise stream.
    # The best-of-K pick maximizes GROUND-TRUTH hole-PSNR — an oracle
    # diagnostic of posterior coverage, never a serving estimator — so
    # its metrics are namespaced *_bok_* and the HEADLINE summary fields
    # stay the first-sample (non-oracle) values (ADVICE r4 #1). One
    # compiled infer fn serves all K streams via a traced noise fold
    # (ADVICE r4 #3: K baked folds used to compile the chain K times).
    n_samples = int(getattr(opt, "eval_samples", 1))
    if n_samples > 1 and model.r_def is None:
        print("[test] --eval_samples needs --refiner (chain is "
              "deterministic without it); falling back to 1 sample")
        n_samples = 1
    if n_samples > 1:
        infer_one = model._build_infer_fn(runtime_fold=True)
    _bok_lbl = f" (best-of-{n_samples} oracle)" if n_samples > 1 else ""

    results_dir = os.path.join(
        opt.results_dir, opt.name, f"{opt.phase}_{opt.which_epoch}"
    )
    gallery = HTMLGallery(results_dir, f"{opt.name} — epoch {opt.which_epoch}")

    all_psnr, all_hole_psnr, all_snr, all_sc = [], [], [], []
    bok_psnr, bok_hole, bok_snr, bok_sc = [], [], [], []
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
        for s in range(n_samples):
            if n_samples > 1:
                out_wav = infer_one(
                    model.state["g"], model.state["v"], wav_in, kmask,
                    model._input["frames"], jnp.int32(s),
                )
            else:
                out_wav = model.infer_fn(
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
        # Headline metrics: the FIRST (non-oracle) sample, always.
        # Cap at --how_many: a final partial batch must not leak extra
        # clips into the means/SEM (summary n and the per-clip record
        # would silently disagree when batchSize doesn't divide it).
        take = max(0, opt.how_many - len(all_psnr))
        s_hole, s_psnr, s_snr, s_sc = cand[0][:4]
        all_psnr += list(s_psnr)[:take]
        all_hole_psnr += list(s_hole)[:take]
        all_snr += list(s_snr)[:take]
        all_sc += list(s_sc)[:take]
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
            # Gallery shows the best-of-K pick; its metric labels carry
            # the oracle tag so the HTML can't be read as a non-oracle
            # arm (same conflation *_bok_* namespacing prevents in the
            # durable record).
            out_wav, out_img = pick(4), pick(5)
            bok_hole += list(b_hole)[:take]
            bok_psnr += list(b_psnr)[:take]
            bok_snr += list(b_snr)[:take]
            bok_sc += list(b_sc)[:take]

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
                    f"PSNR{_bok_lbl}": float(b_psnr[b]),
                    f"holePSNR{_bok_lbl}": float(b_hole[b]),
                    f"SNR{_bok_lbl}": float(b_snr[b]),
                    f"specConv{_bok_lbl}": float(b_sc[b]),
                },
                sr=opt.sample_rate,
            )
            n_done += 1

    path = gallery.save()

    def _mean_sem(xs):
        """(mean, standard error of the mean) — the error bar every
        headline claim rides on (VERDICT r4 weak #4: n=16 evals showed
        ±0.3–0.5 dB trajectory noise quoted to 0.01 dB)."""
        if not xs:
            return float("nan"), float("nan")
        a = np.asarray(xs, np.float64)
        sem = float(a.std(ddof=1) / np.sqrt(len(a))) if len(a) > 1 else 0.0
        return float(a.mean()), sem

    summary = {"n": n_done}
    for name, xs in (("psnr", all_psnr), ("hole_psnr", all_hole_psnr),
                     ("snr", all_snr), ("spec_conv", all_sc)):
        summary[f"{name}_mean"], summary[f"{name}_sem"] = _mean_sem(xs)
    if n_samples > 1:
        summary["eval_samples"] = n_samples
        # Oracle-selected (ground-truth best-of-K) metrics, namespaced
        # so analyzers can never rank them against non-oracle arms by
        # accident (ADVICE r4 #1). hole_psnr_s1_mean is kept as an
        # alias of the headline value for round-4 record continuity.
        for name, xs in (("psnr", bok_psnr), ("hole_psnr", bok_hole),
                         ("snr", bok_snr), ("spec_conv", bok_sc)):
            summary[f"{name}_bok_mean"], summary[f"{name}_bok_sem"] = (
                _mean_sem(xs))
        summary["hole_psnr_s1_mean"] = summary["hole_psnr_mean"]
    print(f"results → {path}")
    print(
        f"PSNR {summary['psnr_mean']:.2f}±{summary['psnr_sem']:.2f} dB | "
        f"hole-PSNR {summary['hole_psnr_mean']:.2f}"
        f"±{summary['hole_psnr_sem']:.2f} dB | "
        f"SNR {summary['snr_mean']:.2f}±{summary['snr_sem']:.2f} dB "
        f"| specConv {summary['spec_conv_mean']:.4f} ({n_done} clips)"
    )
    if n_samples > 1:
        print(
            f"best-of-{n_samples} (oracle pick): hole-PSNR "
            f"{summary['hole_psnr_bok_mean']:.2f}"
            f"±{summary['hole_psnr_bok_sem']:.2f} dB | SNR "
            f"{summary['snr_bok_mean']:.2f} dB"
        )
    if getattr(opt, "log_results", ""):
        # Durable eval record (ADVICE r3: /tmp wipes killed two queue
        # runs' results — append the summary where git can keep it:
        # scripts/quality_results.jsonl in the repo).
        import json as _json
        import time as _time

        rec = {"exp": "test_eval", "tag": opt.log_results,
               "name": opt.name, "which_epoch": opt.which_epoch,
               "dataset_mode": opt.dataset_mode,
               # Pairing provenance: per-clip deltas are only valid
               # between arms sharing the mask stream (seed) and clip
               # order (batchSize). Recorded so paired tools can check
               # instead of trusting the operator.
               "seed": int(opt.seed), "batchSize": int(opt.batchSize),
               "how_many": int(opt.how_many), **summary,
               "t": _time.time()}
        # Per-clip hole-PSNRs (same --seed → same mask stream): two
        # arms' records zip into PAIRED per-clip deltas, whose SEM is
        # ~10× tighter than the unpaired ±1.2 dB clip-difficulty
        # spread — the statistic 0.1-dB recipe comparisons need.
        if len(all_hole_psnr) <= 256:
            rec["hole_psnr_clips"] = [round(float(x), 3)
                                      for x in all_hole_psnr]
        # VIAI_RESULTS_JSONL overrides the destination (tests point it
        # at a tmp file so suite runs never pollute the repo's record).
        out = os.environ.get("VIAI_RESULTS_JSONL") or os.path.join(
            os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))),
            "scripts", "quality_results.jsonl")
        with open(out, "a") as f:
            f.write(_json.dumps(rec) + "\n")
    return summary


if __name__ == "__main__":
    main()

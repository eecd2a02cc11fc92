"""Batched TPU inference service — streaming inpaint with shape buckets.

Reference capability (BASELINE.json config 4, [B:10]): "Batched TPU
inference service: streaming STFT→inpaint→on-device Griffin-Lim with
bucketed mask/clip shapes". The reference has no serving story at all
(test.py loops clips one at a time on CPU Griffin-Lim); this is the
production path the rebuild adds.

Design (SURVEY.md §7.7 "Hard part #4"):
  * One jit-compiled program per BATCH BUCKET (e.g. 8/32/128). Any
    request size is padded up to the nearest bucket, so XLA never sees
    a new shape after warmup — zero recompiles in steady state.
  * Clip length is fixed per service (the 2 s contract); masks are an
    explicit input (the caller's real corrupted region), expressed as
    a dense (B, image_frames) float mask — static shapes regardless of
    gap position/length [B:10].
  * Requests stream through `submit`/`flush`; a micro-batching queue
    coalesces small requests into the largest bucket that fits.
"""

from __future__ import annotations

import dataclasses
import time
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from .train import TrainConfig
from .train.step import make_infer_fn


@dataclasses.dataclass
class ServiceStats:
    clips: int = 0
    batches: int = 0
    padded_clips: int = 0
    total_s: float = 0.0

    @property
    def clips_per_sec(self) -> float:
        return self.clips / self.total_s if self.total_s else 0.0


class InpaintService:
    """Bucketed, streaming spectrogram-inpainting service.

    >>> svc = InpaintService(g_def, g_state, cfg)
    >>> out = svc.inpaint(wavs, gap_start_s=0.8, gap_end_s=1.2)
    """

    def __init__(
        self,
        g_def,
        g_state,
        cfg: TrainConfig,
        v_def=None,
        v_state=None,
        buckets: tp.Sequence[int] = (8, 32, 128),
        gl_iters: int = 32,
        clip_samples: int = 32000,
        sample_rate: int = 16000,
        mesh=None,
        phase_aware: bool = True,
        phase_init: str = "auto",
        mag_sharpen: float = 1.0,
        refiner=None,
        refiner_domain: str = "mag",
        refine_steps: int = 8,
        refine_t: float = 0.35,
        refine_noise: float = 1.0,
        refine_guidance: float = 0.0,
        refine_clamp: str = "x0",
        refine_resample: int = 0,
        refine_avg: int = 1,
        refine_chunk: int = 8,
        refine_mix: float = 0.0,
        refine_selfcond: bool = False,
        complex_mag: str = "sample",
        ensemble_states: tp.Sequence | None = None,
    ):
        """Pass a `mesh` (from viai_tpu.train.make_mesh) to shard each
        bucket batch over the 'data' axis — DP serving across chips,
        params replicated; bucket sizes must be divisible by the data
        axis.

        refiner=(r_def, r_state) serves the stage-2 diffusion refiner
        (train/diffusion.py; VERDICT r3 #7). refiner_domain 'mag' runs
        it between G and Griffin-Lim; 'complex' swaps the whole decode
        for the GL-free complex-domain chain (hole (re, im) sampled by
        DDIM, one iSTFT) — prefer refine_t=1.0 there.

        ensemble_states: K-1 extra same-architecture G states (round-5
        seed ensemble, mirrors test.py --ensemble_names): all K
        predictions are averaged in compressed-magnitude space inside
        the chain. Not supported with refiner_domain='complex'."""
        self.cfg = cfg
        self.mesh = mesh
        self._sharding = None
        n_ensemble = 1
        if ensemble_states:
            if refiner is not None and refiner_domain == "complex":
                raise ValueError("ensemble_states is not supported with "
                                 "refiner_domain='complex'")
            states = [g_state, *ensemble_states]
            g_state = jax.tree.map(
                lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                *states)
            n_ensemble = len(states)
        if mesh is not None:
            from .train.mesh import batch_sharding, replicate

            self._sharding = batch_sharding(mesh)
            g_state = replicate(g_state, mesh)
            if v_state is not None:
                v_state = replicate(v_state, mesh)
            n_data = mesh.shape["data"]
            assert all(b % n_data == 0 for b in buckets), (
                f"bucket sizes {buckets} must divide the data axis "
                f"({n_data})"
            )
        self.g_state = g_state
        self.v_state = v_state if v_state is not None else nnx.State({})
        self.buckets = tuple(sorted(buckets))
        self.clip_samples = clip_samples
        self.sample_rate = sample_rate
        if refiner is not None and mesh is not None:
            from .train.mesh import replicate

            refiner = (refiner[0], replicate(refiner[1], mesh))
        if refiner is not None and refiner_domain == "complex":
            from .train.diffusion import make_complex_refiner_infer_fn

            self._infer = make_complex_refiner_infer_fn(
                g_def, v_def, refiner[0], refiner[1], cfg,
                steps=refine_steps, t_start=refine_t,
                noise_scale=refine_noise, guidance=refine_guidance,
                clamp_mode=refine_clamp, resample=refine_resample,
                refine_avg=refine_avg, refine_chunk=refine_chunk,
                complex_mag=complex_mag, self_cond=refine_selfcond,
                external_mask=True,
            )
        else:
            self._infer = make_infer_fn(
                g_def, v_def, cfg, n_gl_iter=gl_iters, external_mask=True,
                phase_aware=phase_aware, phase_init=phase_init,
                mag_sharpen=mag_sharpen,
                refiner=refiner, refine_steps=refine_steps,
                refine_t=refine_t, refine_noise=refine_noise,
                refine_guidance=refine_guidance,
                refine_clamp=refine_clamp,
                refine_resample=refine_resample,
                refine_avg=refine_avg,
                refine_chunk=refine_chunk,
                refine_mix=refine_mix,
                refine_selfcond=refine_selfcond,
                n_ensemble=n_ensemble,
            )
        self.stats = ServiceStats()
        import threading

        self._queue: list = []
        self._lock = threading.Lock()
        self._flush_timer = None
        self._max_queue = 0
        self._deadline_s: float | None = None

    def _to_device(self, x):
        arr = jnp.asarray(x)
        if self._sharding is not None:
            arr = jax.device_put(arr, self._sharding)
        return arr

    # -- mask helpers ------------------------------------------------------

    def time_mask_from_seconds(
        self, batch: int, gap_start_s, gap_end_s
    ) -> np.ndarray:
        """Gap interval(s) in seconds → dense (B, image_frames) keep-mask.

        Scalars mark one gap; equal-length lists mark several
        (MaskConfig.num_gaps analog for real corrupted regions).
        """
        starts = np.atleast_1d(gap_start_s)
        ends = np.atleast_1d(gap_end_s)
        assert len(starts) == len(ends), "start/end lists must pair up"
        hop = self.cfg.stft.hop_length
        m = np.ones((batch, self.cfg.image_frames), np.float32)
        for s, e in zip(starts, ends):
            f0 = int(s * self.sample_rate / hop)
            f1 = int(np.ceil(e * self.sample_rate / hop)) + 1
            m[:, max(f0, 0) : min(f1, self.cfg.image_frames)] = 0.0
        return m

    # -- direct batched API ------------------------------------------------

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def inpaint(
        self,
        wavs: np.ndarray,
        masks: np.ndarray | None = None,
        gap_start_s: float | None = None,
        gap_end_s: float | None = None,
        frames: np.ndarray | None = None,
    ) -> np.ndarray:
        """(N, clip_samples) wavs (+ masks or a gap interval) → inpainted.

        N may be anything; internally processed in padded buckets.
        """
        wavs = np.asarray(wavs, np.float32)
        n = wavs.shape[0]
        if masks is None:
            assert gap_start_s is not None and gap_end_s is not None, (
                "provide either dense masks or a gap interval"
            )
            masks = self.time_mask_from_seconds(n, gap_start_s, gap_end_s)
        masks = np.asarray(masks, np.float32)
        out = np.empty_like(wavs)
        i = 0
        while i < n:
            remaining = n - i
            bucket = self._bucket_for(remaining)
            take = min(remaining, bucket)
            w = wavs[i : i + take]
            m = masks[i : i + take]
            fr = frames[i : i + take] if frames is not None else None
            if take < bucket:
                padn = bucket - take
                w = np.concatenate([w, np.zeros((padn, w.shape[1]), w.dtype)])
                m = np.concatenate([m, np.ones((padn, m.shape[1]), m.dtype)])
                if fr is not None:
                    fr = np.concatenate(
                        [fr, np.zeros((padn, *fr.shape[1:]), fr.dtype)]
                    )
                self.stats.padded_clips += padn
            t0 = time.perf_counter()
            y = self._infer(
                self.g_state, self.v_state, self._to_device(w),
                self._to_device(m),
                self._to_device(fr) if fr is not None else None,
            )
            y = np.asarray(y)
            self.stats.total_s += time.perf_counter() - t0
            self.stats.batches += 1
            self.stats.clips += take
            out[i : i + take] = y[:take]
            i += take
        return out

    # -- long audio (SURVEY.md §5.7: host-side chunking + overlap-add) ------

    def inpaint_long(
        self,
        wav: np.ndarray,
        gap_start_s: float,
        gap_end_s: float,
        overlap_s: float = 0.25,
    ) -> np.ndarray:
        """Arbitrary-length (T,) waveform with one corrupted interval →
        inpainted waveform of the same length.

        The clip is windowed into service-sized chunks with `overlap_s`
        crossfade; only windows intersecting the gap run through the
        model (others pass through untouched), then linear-crossfade
        stitching. This is the documented long-context strategy —
        no sequence parallelism is needed for a convolutional model
        (SURVEY.md §5.7).
        """
        wav = np.asarray(wav, np.float32)
        T = len(wav)
        cs = self.clip_samples
        if T <= cs:
            padded = np.zeros(cs, np.float32)
            padded[:T] = wav
            out = self.inpaint(padded[None], gap_start_s=gap_start_s,
                               gap_end_s=gap_end_s)[0]
            return out[:T]
        ov = int(overlap_s * self.sample_rate)
        step = cs - ov
        starts = list(range(0, max(T - cs, 0) + 1, step))
        if starts[-1] + cs < T:
            starts.append(T - cs)
        g0, g1 = int(gap_start_s * self.sample_rate), int(
            np.ceil(gap_end_s * self.sample_rate))

        todo, masks = [], []
        for s in starts:
            if s < g1 and s + cs > g0:   # window intersects the gap
                local0 = max(g0 - s, 0) / self.sample_rate
                local1 = min(g1 - s, cs) / self.sample_rate
                todo.append(s)
                masks.append(self.time_mask_from_seconds(
                    1, local0, local1)[0])
        out = wav.copy()
        if todo:
            wins = np.stack([wav[s : s + cs] for s in todo])
            fixed = self.inpaint(wins, masks=np.stack(masks))
            # Crossfade each fixed window into the output.
            ramp = np.ones(cs, np.float32)
            ramp[:ov] = np.linspace(0.0, 1.0, ov, dtype=np.float32)
            ramp[-ov:] = np.linspace(1.0, 0.0, ov, dtype=np.float32)
            acc = np.zeros(T, np.float64)
            wsum = np.zeros(T, np.float64)
            for s, fw in zip(todo, fixed):
                acc[s : s + cs] += fw * ramp
                wsum[s : s + cs] += ramp
            blended = np.where(wsum > 0, acc / np.maximum(wsum, 1e-9), out)
            # Only replace inside the touched windows.
            touched = wsum > 0
            out[touched] = blended[touched].astype(np.float32)
        return out

    # -- streaming / micro-batching API -------------------------------------
    #
    # submit() returns a Future; the queue auto-flushes when it reaches
    # `max_queue` clips or `flush_deadline_s` after the FIRST queued
    # clip (timer thread), so streaming callers never need to call
    # flush() themselves (VERDICT.md round-1 weak #8: manual-only flush
    # made "streaming" batch-on-demand). flush() stays callable for
    # manual draining and keeps its list-of-outputs return.

    def configure_streaming(self, max_queue: int = 0,
                            flush_deadline_s: float | None = None):
        """Enable auto-flush: by queue size, deadline, or both."""
        self._max_queue = max_queue
        self._deadline_s = flush_deadline_s
        return self

    def submit(self, wav: np.ndarray, mask: np.ndarray):
        """Queue one clip → Future resolving to the inpainted waveform."""
        import concurrent.futures
        import threading

        fut: "concurrent.futures.Future[np.ndarray]" = (
            concurrent.futures.Future()
        )
        run_now = False
        with self._lock:
            self._queue.append(
                (np.asarray(wav, np.float32),
                 np.asarray(mask, np.float32), fut)
            )
            deadline = getattr(self, "_deadline_s", None)
            if deadline and self._flush_timer is None:
                self._flush_timer = threading.Timer(deadline, self.flush)
                self._flush_timer.daemon = True
                self._flush_timer.start()
            maxq = getattr(self, "_max_queue", 0)
            if maxq and len(self._queue) >= maxq:
                run_now = True
        if run_now:
            self.flush()
        return fut

    def flush(self) -> list[np.ndarray]:
        with self._lock:
            items = self._queue
            self._queue = []
            if self._flush_timer is not None:
                self._flush_timer.cancel()
                self._flush_timer = None
        if not items:
            return []
        wavs = np.stack([w for w, _, _ in items])
        masks = np.stack([m for _, m, _ in items])
        try:
            out = self.inpaint(wavs, masks)
        except Exception as e:
            for _, _, fut in items:
                if not fut.done():
                    fut.set_exception(e)
            raise
        results = [out[i] for i in range(out.shape[0])]
        for (_, _, fut), r in zip(items, results):
            if not fut.done():
                fut.set_result(r)
        return results

"""train.py — mirrors the reference training entry point.

Reference call stack (SURVEY.md §3.1):
  parse options → CreateDataLoader → create_model → epoch/batch loop →
  set_input → optimize_parameters → periodic print/save →
  update_learning_rate (folded into the optax schedule here).

Usage (reference-compatible flags):
  python train.py --name exp --model audio --dataset_mode synthetic \
      --niter 2 --niter_decay 0 --batchSize 8
"""

from __future__ import annotations

import os
import time

from ..config.options import TrainOptions
from ..data import create_dataloader
from ..model import create_model
from ..utils.visualizer import Visualizer


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

    opt = TrainOptions().parse(args)
    _honor_gpu_ids(opt)
    expr_dir = os.path.join(opt.checkpoints_dir, opt.name)

    clip_samples = int(opt.sample_rate * opt.clip_seconds)
    loader = create_dataloader(
        opt.dataset_mode, opt.dataroot, opt.batchSize, clip_samples,
        opt.sample_rate, opt.nThreads, opt.n_video_frames, opt.frame_size,
        seed=opt.seed, shuffle=not opt.serial_batches,
    )
    steps_per_epoch = opt.steps_per_epoch
    if steps_per_epoch <= 0:
        # Loaders advertise the TRUE per-epoch batch count (files //
        # batchSize) via .epoch_batches — grain/native iterators have no
        # __len__, and len(loader) would double-divide anyway since the
        # loader already batches (ADVICE.md round-1 low #5). Synthetic
        # and any future loaders without the attribute fall back to 100.
        steps_per_epoch = getattr(loader, "epoch_batches", 100)
    opt.steps_per_epoch = steps_per_epoch

    model = create_model(opt)
    if opt.continue_train:
        model.load_networks(opt.which_epoch)
    visualizer = Visualizer(expr_dir, opt.name,
                            tensorboard=getattr(opt, "tensorboard", False))

    total_steps = 0
    # Overlap host→device transfer with device compute: batches are
    # device_put (batch axis sharded over the mesh) `depth` steps ahead
    # of consumption, so the train step never waits on H2D — on hosts
    # with slow links (the axon relay here) this pipelines the
    # per-step transfer behind the previous step's compute.
    # set_input's device_put of an already-placed array is a no-op.
    from ..data.prefetch import device_prefetch

    def _fresh_iter():
        return device_prefetch(iter(loader), model.batch_sharding, depth=2)

    data_iter = _fresh_iter()
    for epoch in range(opt.epoch_count, opt.niter + opt.niter_decay + 1):
        epoch_start = time.time()
        for i in range(steps_per_epoch):
            step_start = time.time()
            try:
                batch = next(data_iter)
            except StopIteration:
                data_iter = _fresh_iter()
                batch = next(data_iter)
            model.set_input(batch)
            model.optimize_parameters()
            total_steps += 1
            if not opt.no_html and total_steps % opt.display_freq == 0:
                visualizer.display_current_results(
                    model.get_current_visuals(), epoch
                )
            if total_steps % opt.print_freq == 0:
                visualizer.print_current_losses(
                    epoch, i, model.get_current_losses(),
                    time.time() - step_start,
                )
            if total_steps % opt.save_latest_freq == 0:
                print(f"saving latest (epoch {epoch}, steps {total_steps})")
                model.save_networks("latest")
        if epoch % opt.save_epoch_freq == 0:
            print(f"saving epoch {epoch} (steps {total_steps})")
            model.save_networks(epoch)
            model.save_networks("latest")
        print(
            f"End of epoch {epoch} / {opt.niter + opt.niter_decay} \t "
            f"Time: {time.time() - epoch_start:.1f}s"
        )
        model.update_learning_rate()
    model.save_networks("latest")
    if hasattr(loader, "close"):
        loader.close()
    return model


if __name__ == "__main__":
    main()

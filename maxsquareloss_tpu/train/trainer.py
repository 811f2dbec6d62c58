"""Supervised Trainer: host loop around the jitted train/eval steps.

Rebuild of the reference ``Trainer`` (reference: tools/train_source.py,
SURVEY.md C14/§3.1): owns loaders, model state, SGD over the 1x/10x groups,
CE(ignore -1), epoch loop with per-iteration poly LR, TensorBoard scalars +
colorized prediction images, periodic validate(), best-mIoU + latest
checkpointing, resume.

TPU-native differences: the per-iteration body is ONE donated jit; batches
stream through double-buffered device_put sharded over the data mesh; the
eval confusion matrix accumulates on device and syncs once per epoch.
"""

from __future__ import annotations

import os
import signal
import time
from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from maxsquareloss_tpu.config import TrainConfig
from maxsquareloss_tpu.data.loader import device_prefetch
from maxsquareloss_tpu.data.palette import decode_labels, inv_preprocess
from maxsquareloss_tpu.metrics import Eval
from maxsquareloss_tpu.models.deeplabv2 import DeepLabV2Config, init_deeplabv2
from maxsquareloss_tpu.parallel.mesh import (
    batch_sharding,
    replicate_tree,
)
from maxsquareloss_tpu.train import checkpoint as ckpt_lib
from maxsquareloss_tpu.train.steps import (
    TrainState,
    make_eval_step,
    make_supervised_train_step,
    make_train_state,
    model_config,
)
from maxsquareloss_tpu.utils.logging import SummaryWriter, setup_logger


def val_preview_image(x0: np.ndarray, numpy_transform: bool) -> np.ndarray:
    """(H, W, 3) float RGB in [0,1] preview of one val input.

    Host-normalized float batches are un-normalized via inv_preprocess;
    uint8 batches (--device_normalize: normalization happens inside the
    jitted step) are the raw RGB image already.
    """
    if x0.dtype == np.uint8:
        return x0.astype(np.float32) / 255.0
    return inv_preprocess(x0[None], numpy_transform=numpy_transform)[0]


class Trainer:
    def __init__(
        self,
        cfg: TrainConfig,
        train_loader: Iterable,
        val_loader: Iterable | None = None,
        params: Any | None = None,
        frozen: Any | None = None,
        logger=None,
        writer: SummaryWriter | None = None,
        num_eval_classes: int | None = None,
        synthia_protocol: bool = False,
    ):
        self.cfg = cfg
        if cfg.debug_nans:
            from maxsquareloss_tpu.utils.debug import enable_debug

            enable_debug(nans=True)
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.is_lead = jax.process_index() == 0
        self.logger = logger or setup_logger(cfg.checkpoint_dir, file=self.is_lead)
        if writer is not None:
            self.writer = writer
        elif self.is_lead:
            self.writer = SummaryWriter(cfg.checkpoint_dir)
        else:
            from maxsquareloss_tpu.utils.logging import NullWriter

            self.writer = NullWriter()
        self.synthia_protocol = synthia_protocol
        self.num_eval_classes = num_eval_classes or cfg.num_classes

        if params is None or frozen is None:
            params, frozen = init_deeplabv2(
                jax.random.key(cfg.seed), model_config(cfg)
            )
        if cfg.data_parallel and jax.process_count() > 1:
            # multi-host: (dcn, ici) mesh over ALL global devices; batches
            # sharded over both axes, params replicated (SURVEY.md §5.8)
            from maxsquareloss_tpu.parallel.multihost import hierarchical_dp_mesh

            self.mesh = hierarchical_dp_mesh(sp=cfg.sp)
        else:
            # DP (+sp) over local devices, pure-SP (1, sp) when
            # --data_parallel false, or None (single device)
            from maxsquareloss_tpu.parallel.mesh import make_mesh

            self.mesh = make_mesh(cfg.data_parallel, cfg.sp)
        if self.mesh is not None:
            params = replicate_tree(self.mesh, params)
            frozen = replicate_tree(self.mesh, frozen)
        self.frozen = frozen
        self.state: TrainState = make_train_state(params)
        if self.mesh is not None:
            self.state = replicate_tree(self.mesh, self.state)

        self.train_step = self._make_train_step()
        self.eval_step = make_eval_step(cfg, self.frozen, self.num_eval_classes)

        self.current_epoch = 0
        self.best_miou = 0.0
        self._epoch_batch = 0       # batches consumed in the current epoch
        self._resume_skip = 0       # batches to skip on the next epoch (resume)
        self._preempt_requested = False  # SIGTERM seen by THIS process
        self.preempted = False           # synced decision: stopped early

    # hooks for UDATrainer -------------------------------------------------

    def _make_train_step(self):
        return make_supervised_train_step(self.cfg, self.frozen)

    def _consume_resume_skip(self, *loaders):
        """Mid-epoch resume: make the next epoch start at the saved batch
        offset (same epoch → same shuffle/augs → exact tail)."""
        skip, self._resume_skip = self._resume_skip, 0
        self._epoch_batch = skip
        if skip:
            for loader in loaders:
                if hasattr(loader, "set_skip"):
                    loader.set_skip(skip)

    def _epoch_batches(self):
        if hasattr(self.train_loader, "set_epoch"):
            # Pin the shuffle/aug RNG epoch explicitly: a zip() in the UDA
            # loop can abandon a loader mid-iteration, and resume must
            # restart the epoch with the same draw (ADVICE r1, high).
            self.train_loader.set_epoch(self.current_epoch)
        self._consume_resume_skip(self.train_loader)
        sharding = batch_sharding(self.mesh) if self.mesh is not None else None
        return device_prefetch(iter(self.train_loader), sharding=sharding)

    def _run_step(self, batch):
        xs, ys, _ = batch
        return self.train_step(self.state, xs, ys)

    def _batch_images(self, batch) -> int:
        return batch[0].shape[0]

    def _expected_epoch_batches(self) -> int | None:
        return getattr(self.train_loader, "num_iterations", None)

    def _epoch_complete(self) -> bool:
        exp = self._expected_epoch_batches()
        return exp is None or self._epoch_batch >= exp

    # ----------------------------------------------------------------------

    def main(self):
        path = self.cfg.pretrained_ckpt_file
        if not path and self.cfg.continue_training:
            # in-place resume: default to this run dir's latest checkpoint so
            # --continue_training alone never silently restarts from scratch
            cand = os.path.join(self.cfg.checkpoint_dir, "checkpoint_latest")
            if os.path.exists(cand):
                path = cand
            else:
                self.logger.warning(
                    "--continue_training set but no --pretrained_ckpt_file "
                    f"given and {cand} does not exist — starting fresh"
                )
        if path:
            self.load_checkpoint(path)
        self.train()

    def load_checkpoint(self, path: str):
        """Load orbax checkpoints or reference torch .pth files."""
        if path.endswith((".pth", ".pt")):
            params, frozen = ckpt_lib.load_torch_pth(path, self.cfg.num_classes)
            # heads missing (class-count mismatch) keep their fresh init —
            # mirrors the reference's classifier re-init on class change
            merged = jax.tree.map(lambda x: x, self.state.params)
            for k, v in params.items():
                merged[k] = jax.tree.map(jnp.asarray, v)
            if self.mesh is not None:
                merged = replicate_tree(self.mesh, merged)
                frozen = replicate_tree(self.mesh, jax.tree.map(jnp.asarray, frozen))
            self.frozen = frozen
            self.state = make_train_state(merged)
            if self.mesh is not None:
                self.state = replicate_tree(self.mesh, self.state)
            self.train_step = self._make_train_step()
            self.eval_step = make_eval_step(self.cfg, self.frozen, self.num_eval_classes)
            self.logger.info(f"loaded torch init from {path}")
        else:
            payload = ckpt_lib.load_checkpoint(path)
            state, frozen, epoch, best = ckpt_lib.restore_train_state(payload)
            if not self.cfg.continue_training:
                # pretrained init only: fresh optimizer + iteration/poly-LR
                # (the reference resumes epoch/iter/optimizer ONLY under
                # --continue_training — SURVEY.md §5.4)
                state = make_train_state(state.params)
            if self.mesh is not None:
                state = replicate_tree(self.mesh, state)
                frozen = replicate_tree(self.mesh, frozen)
            self.state, self.frozen = state, frozen
            self.train_step = self._make_train_step()
            self.eval_step = make_eval_step(self.cfg, self.frozen, self.num_eval_classes)
            if self.cfg.continue_training:
                self.current_epoch, self.best_miou = epoch, best
                self._resume_skip = int(payload.get("epoch_batch", 0))
            self.logger.info(
                f"loaded checkpoint {path} (epoch {epoch}, best mIoU {best:.4f})"
            )

    def save_checkpoint(self, is_best: bool = False, mid_epoch: bool = False):
        # records COMPLETED epochs; a mid-epoch save carries the batch
        # offset within its epoch so resume continues from the exact batch
        # (same shuffle + same per-sample aug RNG). ALL processes must call
        # this: orbax synchronizes across hosts internally (the primary
        # writes, the rest barrier).
        completed = self.current_epoch if mid_epoch else self.current_epoch + 1
        ckpt_lib.save_checkpoint(
            self.cfg.checkpoint_dir,
            self.state,
            self.frozen,
            completed,
            self.best_miou,
            is_best=is_best,
            epoch_batch=self._epoch_batch if mid_epoch else 0,
        )

    # graceful preemption (SIGTERM → checkpoint + clean exit, §5.3) ---------

    def _install_preempt_handler(self):
        """SIGTERM sets a flag; the train loop acts on it at the next step
        boundary. Returns the previous handler (restored after train())."""
        if not self.cfg.preempt_save:
            return None

        def _on_sigterm(signum, frame):
            self._preempt_requested = True
            self.logger.info(
                "SIGTERM received — will checkpoint and exit at the next "
                "step boundary"
            )

        try:
            return signal.signal(signal.SIGTERM, _on_sigterm)
        except ValueError:
            # signal.signal only works in the main thread; a Trainer driven
            # from a worker thread (tests, embedding apps) just skips this
            return None

    def _preempt_now(self, it: int) -> bool:
        """Synced preemption decision, called once per train step.

        Multi-host: a checkpoint save is a collective, so every process must
        stop at the SAME iteration even though preemption SIGTERMs land at
        different times on different hosts — an allgather of the local flag
        every ``cfg.preempt_sync_steps`` lockstep iterations keeps the
        decision in lockstep (``it`` is the global iteration, identical on
        every process) without paying a DCN collective per step. Worst-case
        exit latency is preempt_sync_steps x step_time — the flag exists so
        slow-step runs under short grace windows can lower it."""
        if not self.cfg.preempt_save:
            return False
        if jax.process_count() == 1:
            return self._preempt_requested
        if it % max(1, self.cfg.preempt_sync_steps) != 0:
            return False
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.int32(self._preempt_requested)
        )
        return bool(np.max(flags))

    # ----------------------------------------------------------------------

    def train(self):
        stop_iter = self.cfg.effective_iter_stop()
        prev_handler = self._install_preempt_handler()
        try:
            for epoch in range(self.current_epoch, self.cfg.epoch_num):
                if int(np.asarray(self.state.iteration)) >= stop_iter:
                    # e.g. resuming a checkpoint already at iter_stop: do NOT
                    # run (and checkpoint) a step past the configured stop
                    self.logger.info("already at iter_stop — nothing to train")
                    break
                self.current_epoch = epoch
                self.train_one_epoch()
                if int(np.asarray(self.state.iteration)) >= stop_iter:
                    self.logger.info("reached iter_stop — finishing")
                # an iter_stop that lands mid-epoch must checkpoint as
                # mid-epoch (with the batch offset) so a later
                # --continue_training resumes the exact data order
                mid = not self._epoch_complete()
                if self.preempted:
                    # preemption grace periods are short: skip validation,
                    # save (mid-epoch, with the batch offset) and leave
                    self.save_checkpoint(mid_epoch=mid)
                    self.logger.info(
                        "preempted — checkpoint saved at iter "
                        f"{int(np.asarray(self.state.iteration))}; resume "
                        "with --continue_training"
                    )
                    break
                if self.val_loader is not None and (
                    (epoch + 1) % self.cfg.validation_epoch == 0
                ):
                    miou = self.validate()
                    is_best = miou > self.best_miou
                    self.best_miou = max(self.best_miou, miou)
                    self.save_checkpoint(is_best=is_best, mid_epoch=mid)
                else:
                    self.save_checkpoint(mid_epoch=mid)
                if int(np.asarray(self.state.iteration)) >= stop_iter:
                    break
            # drain INSIDE the protected region: a SIGTERM landing during
            # the final async checkpoint write must not kill the process
            # mid-save (the handler just records it; training is over)
            ckpt_lib.wait_for_saves()
            self.writer.flush()
        finally:
            if prev_handler is not None:
                signal.signal(signal.SIGTERM, prev_handler)

    def train_one_epoch(self):
        cfg = self.cfg
        t0, imgs = time.time(), 0
        last_metrics = {}
        profiling = False
        batches = self._epoch_batches()
        if cfg.tqdm:
            try:
                from tqdm import tqdm as _tqdm

                batches = _tqdm(
                    batches,
                    desc=f"epoch {self.current_epoch}",
                    total=getattr(self.train_loader, "num_iterations", None),
                    leave=False,
                )
            except ImportError:
                pass
        for batch in batches:
            it_before = int(np.asarray(self.state.iteration))
            if cfg.profile and it_before == 2 and not profiling:
                # capture steps 2-5 (past compile + warmup) into ckpt dir
                import os as _os

                jax.profiler.start_trace(
                    _os.path.join(cfg.checkpoint_dir, "profile")
                )
                profiling = True
            self.state, metrics = self._run_step(batch)
            self._epoch_batch += 1
            it = int(np.asarray(self.state.iteration))
            if profiling and it >= 6:
                jax.block_until_ready(self.state.params)
                jax.profiler.stop_trace()
                profiling = False
                self.logger.info("wrote profiler trace (steps 2-5)")
            imgs += self._batch_images(batch)
            last_metrics = metrics
            # scalars every iteration (as the reference's writer.add_scalar);
            # console line every 20
            m = {k: float(np.asarray(v)) for k, v in metrics.items()}
            for k, v in m.items():
                self.writer.add_scalar(f"train/{k}", v, it)
            if it % 20 == 0 or it <= 1:
                self.logger.info(
                    f"epoch {self.current_epoch} iter {it}: "
                    + " ".join(f"{k}={v:.5f}" for k, v in m.items())
                )
            if cfg.save_iter and it % cfg.save_iter == 0:
                # periodic mid-epoch checkpoint (preemption resilience,
                # SURVEY.md §5.3 rebuild plan)
                self.save_checkpoint(mid_epoch=True)
            if self._preempt_now(it):
                self.preempted = True
                break
            if it >= cfg.effective_iter_stop():
                break
        if profiling:
            jax.block_until_ready(self.state.params)
            jax.profiler.stop_trace()
        dt = time.time() - t0
        if imgs:
            self.writer.add_scalar(
                "train/images_per_sec", imgs / dt, int(np.asarray(self.state.iteration))
            )
        return last_metrics

    def validate(self) -> float:
        """Cityscapes-style validation → mIoU (SURVEY.md §3.3)."""
        ev = Eval(self.num_eval_classes)
        sharding = batch_sharding(self.mesh) if self.mesh is not None else None
        # val preview images index into the batch-sharded global array —
        # only fully addressable single-process; the CM (replicated) is the
        # metric and works everywhere
        show_images = self.cfg.show_num_images if jax.process_count() == 1 else 0
        shown = 0
        it = int(np.asarray(self.state.iteration))
        for xs, ys, names in device_prefetch(iter(self.val_loader), sharding=sharding):
            cm, argpred = self.eval_step(self.state.params, xs, ys)
            ev.add_confusion_matrix(np.asarray(cm))
            if shown < show_images:
                pred_np = np.asarray(argpred[0])
                self.writer.add_image(
                    f"val/pred_{shown}", decode_labels(pred_np)[0] / 255.0, it
                )
                self.writer.add_image(
                    f"val/gt_{shown}", decode_labels(np.asarray(ys[0]))[0] / 255.0, it
                )
                self.writer.add_image(
                    f"val/image_{shown}",
                    val_preview_image(
                        np.asarray(xs[0]), self.cfg.numpy_transform
                    ),
                    it,
                )
                shown += 1
        pa = ev.Pixel_Accuracy()
        mpa = ev.Mean_Pixel_Accuracy()
        miou = ev.Mean_Intersection_over_Union()
        fwiou = ev.Frequency_Weighted_Intersection_over_Union()
        for tag, v in [("PA", pa), ("MPA", mpa), ("MIoU", miou), ("FWIoU", fwiou)]:
            self.writer.add_scalar(f"val/{tag}", v, it)
        msg = f"validation @ iter {it}: PA={pa:.4f} MPA={mpa:.4f} MIoU={miou:.4f} FWIoU={fwiou:.4f}"
        if self.synthia_protocol:
            miou16 = ev.Mean_Intersection_over_Union_16()
            miou13 = ev.Mean_Intersection_over_Union_13()
            self.writer.add_scalar("val/MIoU_16", miou16, it)
            self.writer.add_scalar("val/MIoU_13", miou13, it)
            msg += f" MIoU_16={miou16:.4f} MIoU_13={miou13:.4f}"
            miou = miou16
        self.logger.info(msg)
        ev.Print_Every_class_Eval(self.logger)
        return miou

"""UDA trainer: source CE + target max-square family, one fused step.

Rebuild of the reference ``UDATrainer`` (reference: tools/solve_gta5.py /
tools/solve_crosscity.py, SURVEY.md C15/C16/§3.2): per iteration it consumes
one labeled source batch (GTA5 or SYNTHIA) and one unlabeled target batch
(Cityscapes, or an NTHU city), computes source CE + lambda_target * target
loss (mode-dispatched) + optional multi-level self-produced-guidance aux CE,
and takes ONE optimizer step. The reference's two forward/backward passes
are fused into a single jitted grad (gradients add linearly — §3.2 note).
"""

from __future__ import annotations

import itertools
from typing import Iterable

from maxsquareloss_tpu.data.loader import device_prefetch
from maxsquareloss_tpu.parallel.mesh import batch_sharding
from maxsquareloss_tpu.train.steps import make_uda_train_step
from maxsquareloss_tpu.train.trainer import Trainer


class UDATrainer(Trainer):
    def __init__(
        self,
        cfg,
        source_loader: Iterable,
        target_loader: Iterable,
        val_loader: Iterable | None = None,
        **kw,
    ):
        self.target_loader = target_loader
        super().__init__(cfg, train_loader=source_loader, val_loader=val_loader, **kw)

    def _make_train_step(self):
        return make_uda_train_step(self.cfg, self.frozen)

    def _epoch_batches(self):
        """zip(source, target) — epoch length is the shorter loader
        (reference zips the two iterators the same way)."""
        for loader in (self.train_loader, self.target_loader):
            if hasattr(loader, "set_epoch"):
                # zip abandons the longer loader's generator, so without this
                # the source loader would replay epoch 0's shuffle + augs
                # forever (ADVICE r1, high).
                loader.set_epoch(self.current_epoch)
        self._consume_resume_skip(self.train_loader, self.target_loader)
        sharding = batch_sharding(self.mesh) if self.mesh is not None else None
        src = device_prefetch(iter(self.train_loader), sharding=sharding)
        tgt = device_prefetch(iter(self.target_loader), sharding=sharding)
        return zip(src, tgt)

    def _run_step(self, batch):
        (xs, ys, _), (xt, _, _) = batch
        return self.train_step(self.state, xs, ys, xt)

    def _batch_images(self, batch) -> int:
        (xs, _, _), (xt, _, _) = batch
        return xs.shape[0] + xt.shape[0]

    def _expected_epoch_batches(self) -> int | None:
        ns = getattr(self.train_loader, "num_iterations", None)
        nt = getattr(self.target_loader, "num_iterations", None)
        if ns is None or nt is None:
            return None
        return min(ns, nt)  # zip(source, target) ends at the shorter loader

"""End-to-end Trainer / UDATrainer on synthetic loaders (in-process).

Complements the CLI drive: exercises the full host loop — epochs, metrics
logging, validation, best-checkpoint selection, resume — on the 8-device
virtual mesh with tiny models.
"""

import glob
import json
import os

import numpy as np
import pytest

from maxsquareloss_tpu.config import TrainConfig
from maxsquareloss_tpu.data.loader import SegDataLoader
from maxsquareloss_tpu.data.synthetic import SyntheticSegDataset
from maxsquareloss_tpu.train.trainer import Trainer
from maxsquareloss_tpu.train.uda_trainer import UDATrainer

SMALL = (1, 1, 2, 1)


def _loader(n=16, hw=(32, 32), batch=8, seed=0):
    return SegDataLoader(
        SyntheticSegDataset(length=n, hw=hw, seed=seed),
        batch_size=batch, shuffle=True, num_workers=2, seed=seed,
    )


def _cfg(tmp_path, **kw):
    kw.setdefault("blocks", SMALL)
    kw.setdefault("epoch_num", 2)
    kw.setdefault("iter_max", 100)
    kw.setdefault("checkpoint_dir", str(tmp_path))
    kw.setdefault("num_workers", 2)
    kw.setdefault("show_num_images", 1)
    return TrainConfig(**kw)


def test_val_preview_image_handles_both_batch_dtypes():
    """TB val previews must show the actual input for BOTH loader dtypes:
    uint8 (--device_normalize ships raw RGB; normalization runs in-step) and
    host-normalized float32 (inverted via inv_preprocess). Round-3 review
    fix: uint8 batches were previously fed through inv_preprocess as if
    they were normalized BGR floats, producing garbled previews."""
    from maxsquareloss_tpu.data.transforms import img_transform
    from maxsquareloss_tpu.train.trainer import val_preview_image

    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, size=(16, 16, 3)).astype(np.uint8)
    expect = raw.astype(np.float32) / 255.0

    np.testing.assert_array_equal(val_preview_image(raw, True), expect)
    np.testing.assert_array_equal(val_preview_image(raw, False), expect)
    for numpy_transform in (True, False):
        x = img_transform(raw, numpy_transform=numpy_transform)
        got = val_preview_image(x, numpy_transform)
        np.testing.assert_allclose(got, expect, atol=1e-5)


def test_trainer_end_to_end(tmp_path):
    cfg = _cfg(tmp_path)
    tr = Trainer(cfg, _loader(), _loader(n=8, seed=1))
    tr.train()
    # checkpoints + logs + scalars written
    assert os.path.isdir(tmp_path / "checkpoint_latest")
    assert os.path.isdir(tmp_path / "checkpoint_best")
    scalars = [
        json.loads(l) for l in open(tmp_path / "scalars.jsonl")
    ]
    tags = {s["tag"] for s in scalars}
    assert {"val/MIoU", "val/PA"} <= tags
    assert tr.best_miou > 0.0
    # 2 epochs x 2 iters
    assert int(np.asarray(tr.state.iteration)) == 4


def test_trainer_resume(tmp_path):
    cfg = _cfg(tmp_path, epoch_num=1)
    tr = Trainer(cfg, _loader(), None)
    tr.train()
    it1 = int(np.asarray(tr.state.iteration))

    cfg2 = _cfg(
        tmp_path, epoch_num=2, continue_training=True,
        pretrained_ckpt_file=str(tmp_path / "checkpoint_latest"),
    )
    tr2 = Trainer(cfg2, _loader(), None)
    tr2.main()
    assert int(np.asarray(tr2.state.iteration)) == it1 + 2  # one more epoch
    assert tr2.current_epoch == 1


def test_continue_training_defaults_to_run_dir_latest(tmp_path):
    """--continue_training without --pretrained_ckpt_file resumes from the
    run dir's checkpoint_latest instead of silently restarting (round-3
    usability fix; an on-chip CLI run hit the silent restart)."""
    cfg = _cfg(tmp_path, epoch_num=1)
    tr = Trainer(cfg, _loader(), None)
    tr.train()
    it1 = int(np.asarray(tr.state.iteration))
    assert it1 > 0

    cfg2 = _cfg(tmp_path, epoch_num=2, continue_training=True)
    tr2 = Trainer(cfg2, _loader(), None)
    tr2.main()
    assert int(np.asarray(tr2.state.iteration)) == it1 + 2
    assert tr2.current_epoch == 1


def test_mid_epoch_resume_exact_data_order(tmp_path):
    """A preempted run resumed from a --save_iter mid-epoch checkpoint must
    replay the EXACT remaining batches (same shuffle + same aug draws) and
    reproduce the uninterrupted loss trajectory bitwise (VERDICT r1 weak
    #8: resume previously restarted the epoch)."""

    def losses_by_iter(run_dir):
        out = {}
        for line in open(os.path.join(run_dir, "scalars.jsonl")):
            rec = json.loads(line)
            if rec["tag"] == "train/loss":
                out[rec["step"]] = rec["value"]
        return out

    # ground truth: uninterrupted 2 epochs x 4 batches
    dir_a = tmp_path / "a"
    cfg_a = _cfg(dir_a, epoch_num=2, validation_epoch=100)
    Trainer(cfg_a, _loader(n=32, batch=8), None).train()
    truth = losses_by_iter(str(dir_a))
    assert set(truth) == set(range(1, 9))

    # preempted run: dies in step 3, mid-epoch checkpoint after every step
    dir_b = tmp_path / "b"
    cfg_b = _cfg(dir_b, epoch_num=2, validation_epoch=100, save_iter=1)

    class Preempted(KeyboardInterrupt):
        pass

    class DyingTrainer(Trainer):
        def _run_step(self, batch):
            if int(np.asarray(self.state.iteration)) == 2:
                raise Preempted()
            return super()._run_step(batch)

    with pytest.raises(Preempted):
        DyingTrainer(cfg_b, _loader(n=32, batch=8), None).train()

    # resume: must continue at epoch 0, batch 2 — not restart the epoch
    cfg_c = _cfg(
        dir_b, epoch_num=2, validation_epoch=100, continue_training=True,
        pretrained_ckpt_file=str(dir_b / "checkpoint_latest"),
    )
    tr = Trainer(cfg_c, _loader(n=32, batch=8), None)
    tr.main()
    resumed = losses_by_iter(str(dir_b))
    assert int(np.asarray(tr.state.iteration)) == 8
    for it in range(3, 9):
        assert resumed[it] == truth[it], f"iter {it} diverged"


def test_sigterm_preempt_checkpoints_and_resumes_bitwise(tmp_path):
    """Graceful preemption (§5.3): a SIGTERM delivered mid-epoch makes
    train() finish the in-flight step, write a mid-epoch checkpoint with the
    batch offset, and RETURN cleanly (no exception, exit 0 from the CLIs);
    --continue_training then reproduces the uninterrupted loss trajectory
    bitwise. Also pins that the previous SIGTERM handler is restored."""
    import signal as _signal

    def losses_by_iter(run_dir):
        out = {}
        for line in open(os.path.join(run_dir, "scalars.jsonl")):
            rec = json.loads(line)
            if rec["tag"] == "train/loss":
                out[rec["step"]] = rec["value"]
        return out

    # ground truth: uninterrupted 2 epochs x 4 batches
    dir_a = tmp_path / "a"
    cfg_a = _cfg(dir_a, epoch_num=2, validation_epoch=100)
    Trainer(cfg_a, _loader(n=32, batch=8), None).train()
    truth = losses_by_iter(str(dir_a))
    assert set(truth) == set(range(1, 9))

    # preempted run: a real SIGTERM arrives while step 3 is being issued
    dir_b = tmp_path / "b"
    cfg_b = _cfg(dir_b, epoch_num=2, validation_epoch=100)

    class SignalingTrainer(Trainer):
        def _run_step(self, batch):
            if int(np.asarray(self.state.iteration)) == 2:
                os.kill(os.getpid(), _signal.SIGTERM)
            return super()._run_step(batch)

    before = _signal.getsignal(_signal.SIGTERM)
    tr = SignalingTrainer(cfg_b, _loader(n=32, batch=8), None)
    tr.train()  # returns cleanly — no exception
    assert tr.preempted
    assert _signal.getsignal(_signal.SIGTERM) is before
    assert int(np.asarray(tr.state.iteration)) == 3  # in-flight step finished

    # resume: must continue at epoch 0, batch 3 and match the truth bitwise
    cfg_c = _cfg(
        dir_b, epoch_num=2, validation_epoch=100, continue_training=True,
    )
    tr2 = Trainer(cfg_c, _loader(n=32, batch=8), None)
    tr2.main()
    assert not tr2.preempted
    resumed = losses_by_iter(str(dir_b))
    assert int(np.asarray(tr2.state.iteration)) == 8
    for it in range(4, 9):
        assert resumed[it] == truth[it], f"iter {it} diverged"


def test_preempt_poll_throttled_on_multihost(tmp_path, monkeypatch):
    """Multi-host preemption polling: the flag allgather is a host-blocking
    DCN collective, so it must run only on every PREEMPT_SYNC_STEPS-th
    (lockstep) global iteration — never per step — and a remotely-raised
    flag must still win on the next sync step."""
    import jax
    from jax.experimental import multihost_utils

    cfg = _cfg(tmp_path, epoch_num=1)
    tr = Trainer(cfg, _loader(), None)
    calls = []

    def fake_allgather(x):
        calls.append(int(x))
        return np.array([int(x), 1])  # the OTHER process requested preempt

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(multihost_utils, "process_allgather", fake_allgather)

    sync = cfg.preempt_sync_steps
    assert sync == 10  # default; --preempt_sync_steps tunes exit latency
    assert not tr._preempt_now(sync + 3)  # off-interval: no collective
    assert calls == []
    assert tr._preempt_now(2 * sync)  # on-interval: collective, remote flag wins
    assert calls == [0]


def test_preempt_save_false_keeps_default_sigterm(tmp_path):
    """--preempt_save false: the trainer must not install any handler."""
    import signal as _signal

    before = _signal.getsignal(_signal.SIGTERM)

    class Probing(Trainer):
        def _run_step(self, batch):
            assert _signal.getsignal(_signal.SIGTERM) is before
            return super()._run_step(batch)

    cfg = _cfg(tmp_path, epoch_num=1, preempt_save=False)
    Probing(cfg, _loader(), None).train()


def test_uda_trainer_end_to_end(tmp_path):
    cfg = _cfg(tmp_path, target_mode="IW_maxsquare", epoch_num=1)
    tr = UDATrainer(
        cfg,
        source_loader=_loader(seed=0),
        target_loader=_loader(seed=2),
        val_loader=_loader(n=8, seed=3),
    )
    tr.train()
    scalars = [json.loads(l) for l in open(tmp_path / "scalars.jsonl")]
    tags = {s["tag"] for s in scalars}
    assert "train/loss_target_raw" in tags or "train/loss" in tags
    assert int(np.asarray(tr.state.iteration)) == 2


def test_trainer_iter_stop(tmp_path):
    cfg = _cfg(tmp_path, epoch_num=10, iter_stop=3)
    tr = Trainer(cfg, _loader(), None)
    tr.train()
    assert int(np.asarray(tr.state.iteration)) == 3


def test_resume_at_iter_stop_trains_no_extra_step(tmp_path):
    """Resuming a checkpoint already at iter_stop must not advance the
    iteration (or overwrite the checkpoint with post-stop state)."""
    cfg = _cfg(tmp_path, epoch_num=10, iter_stop=3)
    Trainer(cfg, _loader(), None).train()
    cfg2 = _cfg(
        tmp_path, epoch_num=10, iter_stop=3, continue_training=True,
        pretrained_ckpt_file=str(tmp_path / "checkpoint_latest"),
    )
    tr2 = Trainer(cfg2, _loader(), None)
    tr2.main()
    assert int(np.asarray(tr2.state.iteration)) == 3

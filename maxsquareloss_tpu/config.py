"""Config system: dataclasses + reference-flag-compatible argparse shims.

The reference's de-facto config is an argparse namespace threaded through
every constructor (``add_train_args`` / ``add_UDA_train_args`` /
``init_args`` — reference: tools/train_source.py + tools/solve_gta5.py,
SURVEY.md §5.6). We keep flag-for-flag parity with the published commands
(``--target_mode``, ``--lambda_target``, ``--IW_ratio``, ``--threshold``,
``--multi``, ``--iter_max``, ``--poly_power``, ``--freeze_bn``,
``--numpy_transform``, size strings like "1280,720", ...) and materialize a
typed TrainConfig from the parsed namespace.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Any

import jax.numpy as jnp

TARGET_MODES = ("maxsquare", "IW_maxsquare", "entropy", "IW_entropy", "hard")
DATASETS = ("cityscapes", "gta5", "synthia", "crosscity")


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Hashable, jit-static training configuration."""

    # model
    num_classes: int = 19
    backbone: str = "deeplabv2_multi"
    blocks: tuple[int, ...] = (3, 4, 23, 3)  # ResNet-101; tests shrink this
    multi: bool = True                 # multi-level (aux head layer5)
    freeze_bn: bool = True
    compute_dtype: str = "float32"     # 'float32' | 'bfloat16'
    remat: str = ""                    # '' | 'stages'
    # per-compile XLA:TPU options for the jitted steps. 'auto' applies the
    # measured-best set on TPU backends (scoped VMEM 48M: +3.8% step
    # throughput over the compiler default, +1.6-2% int8 inference over
    # 32M — BASELINE.md round-2b sweep + late-round-4 re-sweep) and
    # nothing elsewhere; '' disables; 'k=v,k=v' sets explicit options.
    xla_options: str = "auto"
    concat_batches: bool = False       # UDA: one concatenated fwd for src+tgt (frozen BN)

    # optimizer (reference defaults: SGD 2.5e-4, momentum .9, wd 5e-4)
    lr: float = 2.5e-4
    momentum: float = 0.9
    weight_decay: float = 5e-4
    iter_max: int = 200000
    iter_stop: int | None = None
    poly_power: float = 0.9

    # supervised / source loss
    lambda_seg: float = 0.1            # aux-head CE weight [UNVERIFIED exact
                                       # reference default — exposed as flag]

    # UDA target loss
    target_mode: str = "IW_maxsquare"
    lambda_target: float = 0.09
    ratio: float = 0.2                 # --IW_ratio
    threshold: float = 0.95            # guidance confidence threshold
    guidance_mask: str = "ensemble"    # 'ensemble' | 'per_head_or' — the
                                       # reference's exact mask is [UNVERIFIED]
    # Histogram source for the IW weight formula under --multi. 'guidance'
    # = reference parity: count the THRESHOLDED pseudo-label — exposes the
    # degenerate w_c=1.0 branch (an argmax class none of whose pixels clears
    # --threshold gets total× the healthy weight scale; measured blow-up in
    # BASELINE.md "Multi-arm collapse"). 'argmax' counts the unthresholded
    # prediction argmax instead (exactly the single-head behavior), which
    # makes the degenerate branch unreachable while keeping the thresholded
    # guidance for the aux-head CE. No effect without --multi.
    iw_hist: str = "guidance"          # 'guidance' | 'argmax'

    # data
    batch_size: int = 4
    # validation/eval batch (0 = same as batch_size). Forward-only graphs
    # fit much larger batches and metrics are batch-invariant; batch 16 is
    # the measured v5e throughput sweet spot, +10-16% (BASELINE.md "Eval
    # batch size").
    eval_batch_size: int = 0
    dataset: str = "gta5"
    base_size: tuple[int, int] = (1280, 720)
    crop_size: tuple[int, int] = (1280, 640)
    target_base_size: tuple[int, int] = (1024, 512)
    target_crop_size: tuple[int, int] = (1024, 512)
    num_workers: int = 8
    loader: str = "threads"            # 'threads' | 'grain' (multiprocess)
    # ship uint8 images / int8 labels across host->device and normalize
    # inside the jitted step: 4x less transfer, bitwise-identical f32 math
    device_normalize: bool = False
    cache_dir: str | None = None       # decoded-sample cache (base-size npz)
    random_mirror: bool = True
    random_crop: bool = False
    gaussian_blur: bool = True
    numpy_transform: bool = True
    class_16: bool = False
    class_13: bool = False

    # runtime
    seed: int = 0
    checkpoint_dir: str = "./runs/default"
    pretrained_ckpt_file: str | None = None
    continue_training: bool = False
    epoch_num: int = 100
    save_iter: int | None = None       # also checkpoint every N iterations
    tqdm: bool = True                  # progress bars (reference uses tqdm)
    validation_epoch: int = 1
    show_num_images: int = 3
    data_parallel: bool = True         # shard batch over all local devices
    # spatial partitioning: shard the image HEIGHT dim over a 'space' mesh
    # axis of this size (GSPMD inserts the conv halo exchanges over ICI).
    # The scale-out path for batch-1 / full-res eval+inference where the
    # batch axis has nothing left to shard; 1 = off. With data_parallel the
    # mesh is (devices/sp, sp); with --data_parallel false it is a pure-SP
    # (1, sp) mesh over sp devices. Device count must be divisible by sp,
    # and sharded image heights by sp. Exactness: parallel/mesh.py.
    sp: int = 1
    # stream the eval upsample->softmax->argmax->CM tail over N output rows
    # at a time. EXACT (row-local interpolation, sliced H-matmul); keeps the
    # (N, 2048, 1024, C) full-res probability tensor out of HBM. -1 = auto
    # (chunk 256 whenever the label height exceeds 512 — measured strictly
    # faster AND memory-bounded at full res, BASELINE.md); 0 = explicit off.
    eval_h_chunk: int = -1
    # post-training quantization for eval/predict/serving: '' (off) or
    # 'int8' — backbone convs run int8 on the MXU (1.6-2.2x bf16 conv
    # throughput on v5e), classifier heads stay fp; activations calibrated
    # on the first calib_batches eval batches (models/quantize.py).
    # Training paths ignore this (the optimizer owns fp32 masters).
    quantize: str = ""
    calib_batches: int = 4
    # activation-calibration statistic: 'amax' (exact max — outlier-
    # sensitive by construction: one hot activation scales the whole
    # tensor's grid) or 'p<percentile>' e.g. 'p99.9' / shorthand 'p999'
    # (per-batch |x| percentile, max-reduced over batches; outliers
    # saturate at the ±127 clip in layers.qconv2d instead of stretching
    # the grid). Robustness study: BASELINE.md "int8 calibration".
    calib_mode: str = "amax"
    profile: bool = False              # capture a jax.profiler trace of steps 2-5
    debug_nans: bool = False           # jax_debug_nans sanitizer mode
    # graceful preemption: on SIGTERM, finish the in-flight step, write a
    # mid-epoch checkpoint (carrying the exact batch offset) and exit 0, so
    # --continue_training resumes the preempted run bitwise (§5.3). In
    # multi-host runs the stop decision is allgather-synced every
    # PREEMPT_SYNC_STEPS lockstep iterations (not per step — the flag
    # exchange is a DCN collective) so every process checkpoints the
    # same iteration. preempt_sync_steps trades poll cost for exit
    # latency: worst-case delay before the checkpoint starts is
    # preempt_sync_steps x step_time — lower it when steps are slow
    # (full-res / large batch) and the preemption grace window is short
    # (e.g. 30 s on GCE preemptible).
    preempt_save: bool = True
    preempt_sync_steps: int = 10

    # persistent XLA compilation cache: 'auto' = $XDG_CACHE_HOME/
    # maxsquareloss_tpu/xla (removes the repeated compile cost across CLI
    # invocations — utils/runtime.py), '' = off, else a literal dir
    compilation_cache_dir: str = "auto"

    # multi-host (SURVEY.md §5.8: DCN axis across processes; on TPU pods
    # these are auto-detected and can stay None)
    coordinator_address: str | None = None
    num_processes: int | None = None
    process_id: int | None = None

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    def effective_iter_stop(self) -> int:
        return self.iter_stop if self.iter_stop is not None else self.iter_max


def _size(s: str | tuple) -> tuple[int, int]:
    if isinstance(s, tuple):
        return s
    w, h = (int(v) for v in s.split(","))
    return (w, h)


def add_train_args(p: argparse.ArgumentParser) -> argparse.ArgumentParser:
    """Shared training flags (reference: tools/train_source.py add_train_args)."""
    p.add_argument("--dataset", default="gta5", choices=DATASETS)
    p.add_argument("--data_root_path", default="./datasets")
    p.add_argument("--list_path", default=None,
                   help="split list file; defaults to <root>/<split>.txt")
    p.add_argument("--checkpoint_dir", default="./runs/default")
    p.add_argument("--train_id", default=None,
                   help="experiment tag appended to --checkpoint_dir "
                        "(reference init_args derives the run dir from a "
                        "train-id/tag — SURVEY.md §5.6); pass 'auto' to "
                        "derive '<dataset>_<backbone>[_<target_mode>]'")
    p.add_argument("--pretrained_ckpt_file", default=None)
    p.add_argument("--continue_training", action="store_true")
    p.add_argument("--backbone", default="deeplabv2_multi")
    p.add_argument("--blocks", default="3,4,23,3",
                   help="ResNet stage depths (default R101; smaller values "
                        "for CI/smoke runs, e.g. '1,1,2,1')")
    p.add_argument("--num_classes", type=int, default=19)
    p.add_argument("--multi", type=str2bool, default=True)
    p.add_argument("--freeze_bn", type=str2bool, default=True)
    p.add_argument("--lr", type=float, default=2.5e-4)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--weight_decay", type=float, default=5e-4)
    p.add_argument("--iter_max", type=int, default=200000)
    p.add_argument("--iter_stop", type=int, default=None)
    p.add_argument("--poly_power", type=float, default=0.9)
    p.add_argument("--lambda_seg", type=float, default=0.1)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--eval_batch_size", type=int, default=0,
                   help="validation/eval batch (0 = same as --batch_size; "
                        "16 is the measured TPU throughput sweet spot, "
                        "metrics are batch-invariant)")
    p.add_argument("--base_size", default="1280,720")
    p.add_argument("--crop_size", default="1280,640")
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--loader", default="threads", choices=("threads", "grain"),
                   help="host pipeline: GIL-releasing thread pool (default) "
                        "or grain multiprocess workers (multi-core hosts)")
    p.add_argument("--cache_dir", default=None,
                   help="decoded-sample cache dir (skips PNG decode + base resize)")
    p.add_argument("--device_normalize", type=str2bool, default=False,
                   help="ship uint8 images/int8 labels and normalize on-device "
                        "(4x less host->device traffic, bit-identical)")
    p.add_argument("--random_mirror", type=str2bool, default=True)
    p.add_argument("--random_crop", type=str2bool, default=False)
    p.add_argument("--gaussian_blur", type=str2bool, default=True)
    p.add_argument("--numpy_transform", type=str2bool, default=True)
    p.add_argument("--class_16", type=str2bool, default=False)
    p.add_argument("--class_13", type=str2bool, default=False)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--epoch_num", type=int, default=100)
    p.add_argument("--save_iter", type=int, default=None,
                   help="also checkpoint every N iterations (mid-epoch)")
    p.add_argument("--validation_epoch", type=int, default=1)
    p.add_argument("--show_num_images", type=int, default=3)
    p.add_argument("--compute_dtype", default="float32",
                   choices=("float32", "bfloat16"))
    p.add_argument("--remat", default="", choices=("", "stages"))
    p.add_argument("--concat_batches", type=str2bool, default=False,
                   help="UDA: one concatenated src+tgt forward (exact even "
                        "at unequal crops via the masked-canvas path)")
    p.add_argument("--tqdm", type=str2bool, default=True,
                   help="progress bars (disable for clean batch logs)")
    p.add_argument("--xla_options", default="auto",
                   help="XLA compiler options for the jitted steps: 'auto' "
                        "(measured-best on TPU), '' (none), or 'k=v,k=v'")
    p.add_argument("--data_parallel", type=str2bool, default=True)
    p.add_argument("--sp", type=int, default=1,
                   help="spatial partitioning: shard image height over a "
                        "'space' mesh axis of this size (batch shards over "
                        "the remaining devices/sp). For batch-1/full-res "
                        "eval+inference scaling; 1 = off")
    p.add_argument("--eval_h_chunk", type=int, default=-1,
                   help="stream eval upsample/argmax/CM over N output rows "
                        "at a time (exact; for full-res label protocols). "
                        "-1 = auto (256 when label height > 512), 0 = off")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of the first steps")
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax_debug_nans (sanitizer mode)")
    p.add_argument("--quantize", default="", choices=("", "int8"),
                   help="eval/predict/serving only: int8 backbone convs on "
                        "the MXU (activations calibrated on the first "
                        "--calib_batches eval batches); heads stay fp")
    p.add_argument("--calib_batches", type=int, default=4,
                   help="batches used for int8 activation calibration")
    p.add_argument("--calib_mode", default="amax",
                   help="int8 activation calibration statistic: 'amax' or a "
                        "percentile like 'p99.9' (shorthand 'p999'); "
                        "percentiles clip outliers instead of stretching "
                        "the quantization grid")
    p.add_argument("--preempt_save", type=str2bool, default=True,
                   help="on SIGTERM: checkpoint at the next step boundary "
                        "and exit cleanly (resume with --continue_training)")
    p.add_argument("--preempt_sync_steps", type=int, default=10,
                   help="multi-host: poll the preemption flag (a DCN "
                        "allgather) every N lockstep iterations; lower for "
                        "slow steps + short grace windows")
    p.add_argument("--compilation_cache_dir", default="auto",
                   help="persistent XLA compilation cache: 'auto' "
                        "(~/.cache/maxsquareloss_tpu/xla), '' to disable, "
                        "or an explicit dir — repeat CLI runs skip compiles")
    p.add_argument("--coordinator_address", default=None,
                   help="multi-host: ip:port of process 0 (TPU pods "
                        "auto-detect; leave unset for single-host)")
    p.add_argument("--num_processes", type=int, default=None,
                   help="multi-host: total process count")
    p.add_argument("--process_id", type=int, default=None,
                   help="multi-host: this process's index")
    return p


def add_uda_train_args(p: argparse.ArgumentParser) -> argparse.ArgumentParser:
    """UDA flags (reference: tools/solve_gta5.py add_UDA_train_args)."""
    p.add_argument("--source_dataset", default="gta5", choices=("gta5", "synthia"))
    p.add_argument("--source_data_path", default=None)
    p.add_argument("--source_list_path", default=None)
    p.add_argument("--target_data_path", default=None)
    p.add_argument("--target_list_path", default=None)
    p.add_argument("--target_mode", default="IW_maxsquare", choices=TARGET_MODES)
    p.add_argument("--lambda_target", type=float, default=0.09)
    p.add_argument("--IW_ratio", type=float, default=0.2)
    p.add_argument("--threshold", type=float, default=0.95)
    p.add_argument("--guidance_mask", default="ensemble",
                   choices=("ensemble", "per_head_or"),
                   help="multi-level guidance confidence mask: ensemble-max "
                        "> t, or either head's own max > t (the reference's "
                        "exact condition is unverified — see docs/PARITY.md)")
    p.add_argument("--iw_hist", default="guidance",
                   choices=("guidance", "argmax"),
                   help="IW histogram source under --multi: 'guidance' "
                        "(reference parity — thresholded pseudo-label; has a "
                        "degenerate weight-1.0 branch, BASELINE.md 'Multi-arm "
                        "collapse') or 'argmax' (unthresholded prediction "
                        "argmax, the single-head behavior — degenerate branch "
                        "unreachable)")
    p.add_argument("--target_base_size", default="1024,512")
    p.add_argument("--target_crop_size", default="1024,512")
    return p


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    return str(v).lower() in ("1", "true", "yes", "y", "t")


def config_from_args(args: argparse.Namespace) -> TrainConfig:
    """init_args equivalent: post-process the namespace into a TrainConfig."""
    fields = {f.name for f in dataclasses.fields(TrainConfig)}
    kv: dict[str, Any] = {}
    for k, v in vars(args).items():
        if k == "IW_ratio":
            kv["ratio"] = v
        elif k in fields:
            kv[k] = v
    for k in ("base_size", "crop_size", "target_base_size", "target_crop_size"):
        if k in kv and kv[k] is not None:
            kv[k] = _size(kv[k])
    if isinstance(kv.get("blocks"), str):
        kv["blocks"] = tuple(int(v) for v in kv["blocks"].split(","))
    train_id = getattr(args, "train_id", None)
    if train_id:
        if train_id == "auto":
            parts = [kv.get("dataset", "gta5"), kv.get("backbone", "deeplabv2_multi")]
            if getattr(args, "target_mode", None):
                parts.append(args.target_mode)
            train_id = "_".join(parts)
        kv["checkpoint_dir"] = os.path.join(
            kv.get("checkpoint_dir", "./runs/default"), train_id
        )
    cfg = TrainConfig(**kv)
    if cfg.eval_batch_size < 0:
        raise ValueError(
            f"--eval_batch_size must be >= 0 (0 = same as --batch_size), "
            f"got {cfg.eval_batch_size}"
        )
    if cfg.sp < 1:
        raise ValueError(f"--sp must be >= 1, got {cfg.sp}")
    if cfg.sp > 1:
        # fail fast with a clear message instead of a mid-run JAX sharding
        # error: every height that gets device_put under the 'space' axis
        # must split evenly (full-res label heights are checked by JAX at
        # device_put time — they are not knowable here)
        for name in ("crop_size", "target_crop_size", "base_size"):
            wh = getattr(cfg, name)
            if wh and wh[1] % cfg.sp:
                raise ValueError(
                    f"--sp {cfg.sp} must divide the image height: "
                    f"{name} H = {wh[1]}"
                )
        if cfg.quantize:
            # XLA's spatial partitioner (GSPMD) mistypes the zero constant
            # it pads s8 conv-input halos with ("element types of the
            # operands to Pad do not match", jax 0.9.0) — not workaroundable
            # from user code (explicit s8/f32 pads + VALID convs still hit
            # the halo-alignment pad it inserts itself). Fail fast with the
            # honest reason instead of an HLO verifier error mid-eval.
            raise ValueError(
                f"--quantize {cfg.quantize} does not compose with --sp "
                f"{cfg.sp}: XLA's GSPMD partitioner cannot pad int8 conv "
                "halos in this version. Use --sp for fp serving, or int8 "
                "with data parallelism (--quantize composes with "
                "--data_parallel / multi-host)."
            )
    os.makedirs(cfg.checkpoint_dir, exist_ok=True)
    return cfg

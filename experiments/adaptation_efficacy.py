"""Adaptation-efficacy benchmark: does the UDA branch IMPROVE target mIoU?

The reference's headline claim (paper Tab. 1, SURVEY.md §6) is that
max-square adaptation on unlabeled target images beats source-only training
on the target val split (GTA5→Cityscapes: 36.6 → 44.3 MaxSquare → 45.2 +IW
→ 46.4 +Multi). That exact table is blocked on this box (no datasets, zero
egress), so this harness measures the same EFFECT on the synthetic
domain-shift pair (data/synthetic.py write_domain_shift_pair) through the
REAL CLIs — tools/train_source.py, tools/solve_gta5.py, tools/evaluate.py —
with a held-out labeled target val split.

Arms, per seed:
  in_domain    source ckpt evaluated on an UNSHIFTED copy of the val split
               (the no-domain-gap upper bound)
  source_only  source ckpt evaluated on the SHIFTED target val split
  control_l0   control: the SAME solve_gta5.py run with --lambda_target 0 —
               identical LR schedule, data order and source CE; only the
               target-loss term is removed (isolates "the UDA loss helps"
               from "more training helps")
  maxsquare / IW_maxsquare / IW_maxsquare_multi / entropy ...
               solve_gta5.py from the source ckpt, evaluated on target val

Usage (numbers recorded in BASELINE.md "Adaptation efficacy"):
  python experiments/adaptation_efficacy.py --seeds 0,1,2 --out runs/adapt.json
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIZE_FLAGS = ["--base_size", "128,64", "--crop_size", "128,64"]
TGT_SIZE_FLAGS = ["--target_base_size", "128,64", "--target_crop_size", "128,64"]
COMMON = [
    "--blocks", "1,1,2,1", "--batch_size", "8", "--num_workers", "2",
    "--gaussian_blur", "false", "--numpy_transform", "false",
    "--tqdm", "false", "--validation_epoch", "1000000",
]


def run_cli(tool: str, args: list[str], platform: str) -> str:
    env = dict(os.environ)
    if platform == "cpu8":
        env.update(
            PALLAS_AXON_POOL_IPS="",
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=8",
        )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", tool), *args],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=3600,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"{tool} {' '.join(args)} failed:\n{proc.stdout[-3000:]}\n"
            f"{proc.stderr[-3000:]}"
        )
    return proc.stdout + proc.stderr


def eval_miou(work: str, tag: str, data: str, ckpt: str, seed: int,
              platform: str) -> float:
    out = run_cli("evaluate.py", [
        "--dataset", "cityscapes", "--data_root_path", data,
        "--checkpoint_dir", os.path.join(work, f"eval_{tag}"),
        "--pretrained_ckpt_file", ckpt, "--seed", str(seed),
        *SIZE_FLAGS, *COMMON,
    ], platform)
    m = re.search(r"'MIoU': ([0-9.eE+-]+)", out)
    assert m, f"no MIoU in evaluate output:\n{out[-2000:]}"
    return float(m.group(1))


def run_seed(work: str, seed: int, a) -> dict[str, float]:
    from maxsquareloss_tpu.data.synthetic import write_domain_shift_pair

    shift = tuple(float(v) for v in a.shift.split(","))
    gen_kw = dict(
        n_source=a.n_images, n_target_train=a.n_images,
        n_target_val=a.n_val, sigma=a.sigma, spacing=a.spacing,
        patch=a.patch, seed=seed,
    )
    data = os.path.join(work, "data")
    write_domain_shift_pair(data, shift=shift, **gen_kw)
    # unshifted copy of the target domain: in-domain upper bound for the val
    # protocol (same geometry distribution, no photometric shift)
    data_id = os.path.join(work, "data_indomain")
    write_domain_shift_pair(data_id, shift=(0.0, 0.0, 0.0), **gen_kw)

    res: dict[str, float] = {}
    t0 = time.time()

    src_dir = os.path.join(work, "src")
    run_cli("train_source.py", [
        "--dataset", "gta5", "--data_root_path", data,
        "--checkpoint_dir", src_dir, "--lr", str(a.lr_src),
        "--iter_max", str(a.iters_src), "--iter_stop", str(a.iters_src),
        "--epoch_num", "1000000", "--seed", str(seed),
        *SIZE_FLAGS, *COMMON,
    ], a.platform)
    src_ckpt = f"{src_dir}/checkpoint_latest"
    res["in_domain"] = eval_miou(work, "indom", data_id, src_ckpt, seed, a.platform)
    res["source_only"] = eval_miou(work, "src", data, src_ckpt, seed, a.platform)

    def run_uda(tag: str, target_mode: str, multi: bool, lam: float,
                thr: float | None = None, iw_hist: str | None = None) -> float:
        uda_dir = os.path.join(work, f"uda_{tag}")
        thr_flags = [] if thr is None else ["--threshold", str(thr)]
        if iw_hist is not None:
            thr_flags += ["--iw_hist", iw_hist]
        run_cli("solve_gta5.py", [
            "--source_dataset", "gta5", "--data_root_path", data,
            "--checkpoint_dir", uda_dir, "--target_mode", target_mode,
            "--multi", str(multi).lower(), "--lr", str(a.lr_uda),
            "--lambda_target", str(lam), *thr_flags,
            "--pretrained_ckpt_file", src_ckpt,
            "--iter_max", str(a.iters_uda), "--iter_stop", str(a.iters_uda),
            "--epoch_num", "1000000", "--seed", str(seed),
            *SIZE_FLAGS, *TGT_SIZE_FLAGS, *COMMON,
        ], a.platform)
        return eval_miou(
            work, tag, data, f"{uda_dir}/checkpoint_latest", seed, a.platform
        )

    # control: the exact UDA run with the target term zero-weighted
    if not a.skip_control:
        res["control_l0"] = run_uda("control_l0", "maxsquare", False, 0.0)
    for spec in a.modes.split(","):
        # per-arm overrides: "mode[@LAM][@tTHR][@hargmax]" — LAM overrides
        # --lambda_target, tTHR overrides the guidance --threshold, hargmax
        # sets --iw_hist argmax (count the IW histogram on the unthresholded
        # argmax — the multi-collapse mitigation, BASELINE.md)
        # (e.g. "IW_maxsquare_multi@64@t0.8"). The multi mode adds a second
        # lambda-scaled term (lambda*lambda_seg * pseudo-label CE on the aux
        # head), so its effective pressure at a given lambda is higher than
        # the single-head modes'.
        parts = spec.split("@")
        mode, lam, thr, iw_hist = parts[0], a.lambda_target, None, None
        for tok in parts[1:]:
            if tok == "hargmax":
                iw_hist = "argmax"
            elif tok.startswith("t"):
                thr = float(tok[1:])
            else:
                lam = float(tok)
        target_mode, multi = mode, False
        if mode.endswith("_multi"):
            target_mode, multi = mode[: -len("_multi")], True
        key = mode
        if lam != a.lambda_target:
            key += f"@{lam:g}"
        if thr is not None:
            key += f"@t{thr:g}"
        if iw_hist is not None:
            key += "@hargmax"
        res[key] = run_uda(
            key.replace("@", "_").replace(".", "p"), target_mode, multi,
            lam, thr, iw_hist
        )
    res["_wall_s"] = round(time.time() - t0, 1)
    return res


def main(argv=None):
    p = argparse.ArgumentParser("adaptation_efficacy")
    p.add_argument("--seeds", default="0,1,2")
    p.add_argument("--modes", default="maxsquare,IW_maxsquare,IW_maxsquare_multi")
    p.add_argument("--iters_src", type=int, default=300)
    p.add_argument("--iters_uda", type=int, default=200)
    p.add_argument("--lr_src", type=float, default=0.01)
    p.add_argument("--lr_uda", type=float, default=0.002)
    p.add_argument("--lambda_target", type=float, default=0.09)
    p.add_argument("--n_images", type=int, default=32)
    p.add_argument("--n_val", type=int, default=16)
    p.add_argument("--sigma", type=float, default=18.0)
    p.add_argument("--spacing", type=float, default=80.0)
    p.add_argument("--patch", type=int, default=16)
    p.add_argument("--shift", default="24,-24,24")
    p.add_argument("--platform", default="native", choices=("native", "cpu8"),
                   help="native = this process's backend (TPU here); cpu8 = "
                        "the virtual 8-device CPU mesh the tests use")
    p.add_argument("--out", default="")
    p.add_argument("--keep_work", action="store_true")
    p.add_argument("--skip_control", action="store_true",
                   help="skip the lambda_target=0 control arm (ladder runs "
                        "that reuse an already-measured control)")
    a = p.parse_args(argv)

    all_res: dict[str, dict] = {}
    for seed in (int(s) for s in a.seeds.split(",")):
        work = tempfile.mkdtemp(prefix=f"adapt_s{seed}_")
        try:
            all_res[str(seed)] = run_seed(work, seed, a)
            print(f"seed {seed}: {json.dumps(all_res[str(seed)])}", flush=True)
        finally:
            if not a.keep_work:
                shutil.rmtree(work, ignore_errors=True)

    arms = [k for k in next(iter(all_res.values())) if not k.startswith("_")]
    summary = {
        arm: {
            "mean": round(
                sum(r[arm] for r in all_res.values()) / len(all_res), 4
            ),
            "per_seed": [round(r[arm], 4) for r in all_res.values()],
        }
        for arm in arms
    }
    print("\n== adaptation efficacy (target-val mIoU) ==")
    for arm in arms:
        s = summary[arm]
        print(f"  {arm:20s} mean {s['mean']:.4f}  per-seed {s['per_seed']}")
    result = {"config": vars(a), "per_seed": all_res, "summary": summary}
    if a.out:
        os.makedirs(os.path.dirname(a.out) or ".", exist_ok=True)
        with open(a.out, "w") as f:
            json.dump(result, f, indent=2)
        print(f"wrote {a.out}")


if __name__ == "__main__":
    main()

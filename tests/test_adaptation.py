"""Adaptation-efficacy gate (VERDICT r4 missing #1 / next #1).

The reference exists to make this claim: training on unlabeled target
images with the max-square family IMPROVES target mIoU over source-only
training (paper Tab. 1: 36.6 → 44.3/45.2/46.4 — SURVEY.md §6). Every other
test in this suite proves parity of losses/steps/trajectories; this one
proves the EFFECT, end to end through the real CLIs, on the synthetic
domain-shift pair (data/synthetic.py write_domain_shift_pair):

- the photometric shift actually hurts: source-only target mIoU sits well
  below the in-domain bound,
- adaptation actually helps: the IW_maxsquare arm beats BOTH the
  source-only checkpoint and the lambda_target=0 control (same LR
  schedule, same data order, same source CE — the target-loss term is the
  only difference) by a calibrated margin.

Margins are set from the measured seed-0/1/2 headroom recorded in
BASELINE.md "Adaptation efficacy" — a sign-flipped lambda_target, an
all-ignore guidance label, or a broken IW histogram drops the UDA arm to
or below the control and trips this gate (unlike the old 0.5x
non-collapse floor it replaces, which VERDICT r4 weak #1 showed would
pass both).
"""

import json
import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SIZE_FLAGS = ["--base_size", "128,64", "--crop_size", "128,64"]
TGT_SIZE_FLAGS = ["--target_base_size", "128,64", "--target_crop_size", "128,64"]
COMMON = [
    "--blocks", "1,1,2,1", "--batch_size", "8", "--num_workers", "2",
    "--gaussian_blur", "false", "--numpy_transform", "false",
    "--tqdm", "false", "--validation_epoch", "1000000", "--seed", "0",
]


def _run_cli(tool: str, args: list[str]) -> str:
    env = dict(os.environ)
    env.update(
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", tool), *args],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=2400,
    )
    assert proc.returncode == 0, (
        f"{tool} failed:\n{proc.stdout[-3000:]}\n{proc.stderr[-3000:]}"
    )
    return proc.stdout + proc.stderr


def _eval_miou(run_dir: str, data: str, ckpt: str) -> float:
    out = _run_cli("evaluate.py", [
        "--dataset", "cityscapes", "--data_root_path", data,
        "--checkpoint_dir", run_dir, "--pretrained_ckpt_file", ckpt,
        *SIZE_FLAGS, *COMMON,
    ])
    m = re.search(r"'MIoU': ([0-9.eE+-]+)", out)
    assert m, f"no MIoU in output:\n{out[-2000:]}"
    return float(m.group(1))


ITERS_SRC = 300
ITERS_UDA = 200


@pytest.mark.slow
def test_uda_beats_source_only_on_domain_shift(tmp_path):
    from maxsquareloss_tpu.data.synthetic import write_domain_shift_pair

    data = str(tmp_path / "data")
    write_domain_shift_pair(data, seed=0)

    src_dir = str(tmp_path / "src")
    _run_cli("train_source.py", [
        "--dataset", "gta5", "--data_root_path", data,
        "--checkpoint_dir", src_dir, "--lr", "0.01",
        "--iter_max", str(ITERS_SRC), "--iter_stop", str(ITERS_SRC),
        "--epoch_num", "1000000", *SIZE_FLAGS, *COMMON,
    ])
    src_ckpt = f"{src_dir}/checkpoint_latest"
    miou_src = _eval_miou(str(tmp_path / "ev_src"), data, src_ckpt)

    def uda(tag: str, lam: float) -> float:
        d = str(tmp_path / tag)
        _run_cli("solve_gta5.py", [
            "--source_dataset", "gta5", "--data_root_path", data,
            "--checkpoint_dir", d, "--target_mode", "IW_maxsquare",
            "--multi", "false", "--lr", "0.002",
            "--lambda_target", str(lam),
            "--pretrained_ckpt_file", src_ckpt,
            "--iter_max", str(ITERS_UDA), "--iter_stop", str(ITERS_UDA),
            "--epoch_num", "1000000", *SIZE_FLAGS, *TGT_SIZE_FLAGS, *COMMON,
        ])
        return _eval_miou(str(tmp_path / f"ev_{tag}"), data,
                          f"{d}/checkpoint_latest")

    # lambda_target=64 is the benchmark protocol (BASELINE.md "Adaptation
    # efficacy"): the paper's 0.09 is tuned for ~80k-iteration runs; at this
    # 200-iteration scale the target term needs ~64 to exert comparable
    # total pressure (seed-0 ladder: 0.09 moves mIoU by +0.0005, 64 by +6.7
    # points over the control).
    miou_ctrl = uda("ctrl", 0.0)       # identical run, target term removed
    miou_uda = uda("uda", 64.0)

    # Margins calibrated in BASELINE.md "Adaptation efficacy" (seeds 0-2).
    assert miou_uda > miou_ctrl + 0.03, (
        f"UDA does not beat the lambda_target=0 control: "
        f"{miou_uda:.4f} vs {miou_ctrl:.4f} (source-only {miou_src:.4f})"
    )
    assert miou_uda > miou_src + 0.03, (
        f"UDA does not beat the source-only checkpoint: "
        f"{miou_uda:.4f} vs {miou_src:.4f}"
    )

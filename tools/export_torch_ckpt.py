"""Export an orbax checkpoint → reference-layout torch .pth.

The inverse of tools/convert_torch_ckpt.py: lets models trained in this
framework be evaluated or fine-tuned in the reference PyTorch codebase
(`shiyutang/MaxSquareLoss` — its load_checkpoint accepts bare state_dicts
and full {epoch, iteration, state_dict} checkpoints, SURVEY.md §3.5).
Conv kernels transpose HWIO→OIHW; folded frozen-BN emits functionally
identical (gamma, beta, mean=0, var=1) BN params; classifier heads use the
reference's ``conv2d_list`` naming::

    python tools/export_torch_ckpt.py \
        --input ./runs/gta5_iw/checkpoint_best --output gta5_iw_best.pth \
        [--module_prefix] [--full]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser("export_torch_ckpt")
    p.add_argument("--input", required=True, help="orbax checkpoint dir")
    p.add_argument("--output", required=True, help=".pth file to write")
    p.add_argument(
        "--module_prefix", action="store_true",
        help="prepend the nn.DataParallel 'module.' prefix the reference's "
             "full training checkpoints carry",
    )
    p.add_argument(
        "--full", action="store_true",
        help="wrap as {epoch, iteration, state_dict} (reference full-"
             "checkpoint format; optimizer state is not translated — torch "
             "momentum layouts differ)",
    )
    args = p.parse_args(argv)

    import torch

    from maxsquareloss_tpu.convert import pytrees_to_torch_state_dict
    from maxsquareloss_tpu.train import checkpoint as ckpt_lib

    payload = ckpt_lib.load_checkpoint(args.input)
    state, frozen, epoch, _best = ckpt_lib.restore_train_state(payload)
    sd = pytrees_to_torch_state_dict(
        state.params, frozen, module_prefix=args.module_prefix
    )
    sd_t = {k: torch.from_numpy(v.copy()) if hasattr(v, "ndim") and v.ndim
            else torch.tensor(v) for k, v in sd.items()}
    if args.full:
        out = {
            "epoch": int(epoch),
            "iteration": int(payload.get("iteration", 0)),
            "state_dict": sd_t,
        }
    else:
        out = sd_t
    torch.save(out, args.output)
    print(
        f"wrote {args.output}: {len(sd_t)} tensors"
        + (" (full checkpoint)" if args.full else " (bare state_dict)")
    )


if __name__ == "__main__":
    main()

"""End-to-end disk → loader → device UDA training throughput (VERDICT r2 #1).

The synthetic-batch step rate (bench.py default mode) excludes the host
pipeline entirely; the reference trains from disk (SURVEY.md §3.4). This
mode measures the WHOLE path on the real flagship protocol shapes:

  GTA5-size source PNGs (1914x1052) → decode → resize base 1280x720 → aug
  → normalize, Cityscapes-size target PNGs (2048x1024) → base 1024x512,
  SegDataLoader worker threads → device_prefetch → fused UDA train step.

Reported rates (images/sec/chip, counting source+target images):
  e2e_cold   — steady-state epoch with NO decoded-sample cache
               (every epoch pays PNG decode + base resize)
  e2e_warm   — steady-state epoch with --cache_dir warm
               (decode+resize skipped; bit-identical output, tested)
  device_only — the same compiled step re-run on device-resident batches
               (host pipeline excluded; the e2e ceiling)

Timing protocol (axon relay, BASELINE.md methodology): the train state
chains through every step and the epoch is fenced by a host readback of the
final loss; per-step readbacks are avoided so host/device overlap is
undisturbed. Inputs differ every step, so the relay's result cache cannot
fire.

Run via:  python bench.py --mode e2e [--data_root DIR --num_workers N]
"""

from __future__ import annotations

import json
import os
import sys
import time

# allow direct invocation (python experiments/bench_e2e.py) like the other
# experiments; bench.py --mode e2e imports run_e2e with the repo on the path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# Cityscapes raw ids that map to trainIds (blocky synthetic labels use these)
_MAPPED_IDS = (7, 8, 11, 12, 13, 17, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 31, 32, 33)

SRC_DISK_WH = (1914, 1052)  # GTA5 native render size
TGT_DISK_WH = (2048, 1024)  # Cityscapes native size
N_PER_DOMAIN = 96


def _synth_pair(rng: np.random.Generator, w: int, h: int):
    """Blocky label field + per-class-colored image with mild noise.

    Generated at 1/8 scale and upsampled so PNG encode stays fast and file
    sizes land in a natural-image-like range (structured content, not
    incompressible noise).
    """
    from PIL import Image

    hs, ws = h // 8, w // 8
    lab = np.full((hs, ws), _MAPPED_IDS[0], np.uint8)
    for _ in range(8):
        c = rng.choice(_MAPPED_IDS)
        y0, x0 = rng.integers(0, hs // 2), rng.integers(0, ws // 2)
        lab[y0 : y0 + rng.integers(hs // 8, hs // 2),
            x0 : x0 + rng.integers(ws // 8, ws // 2)] = c
    img_s = np.zeros((hs, ws, 3), np.uint8)
    for c in np.unique(lab):
        cr = np.random.default_rng(int(c))
        img_s[lab == c] = cr.integers(16, 240, size=3).astype(np.uint8)
    img_s = np.clip(
        img_s.astype(np.int16) + rng.integers(-12, 12, size=img_s.shape), 0, 255
    ).astype(np.uint8)
    img = Image.fromarray(img_s).resize((w, h), Image.BILINEAR)
    noise = rng.integers(-6, 6, size=(h, w, 3))
    img = np.clip(np.asarray(img).astype(np.int16) + noise, 0, 255).astype(np.uint8)
    lab = np.asarray(Image.fromarray(lab).resize((w, h), Image.NEAREST))
    return img, lab


def ensure_dataset(
    root: str,
    n: int = N_PER_DOMAIN,
    src_wh: tuple[int, int] = SRC_DISK_WH,
    tgt_wh: tuple[int, int] = TGT_DISK_WH,
) -> str:
    """Synthesize the protocol-shape on-disk dataset once; reuse thereafter."""
    from PIL import Image

    stamp = os.path.join(root, ".complete")
    want = f"v1 n={n} src={src_wh} tgt={tgt_wh}"
    if os.path.exists(stamp) and open(stamp).read() == want:
        return root
    rng = np.random.default_rng(7)
    g = os.path.join(root, "GTA5")
    os.makedirs(f"{g}/images", exist_ok=True)
    os.makedirs(f"{g}/labels", exist_ok=True)
    items = []
    for i in range(n):
        img, lab = _synth_pair(rng, *src_wh)
        Image.fromarray(img).save(f"{g}/images/{i:05d}.png")
        Image.fromarray(lab).save(f"{g}/labels/{i:05d}.png")
        items.append(f"{i:05d}.png")
    with open(f"{g}/train.txt", "w") as f:
        f.write("\n".join(items))

    c = os.path.join(root, "Cityscapes")
    tr = []
    for i in range(n):
        rel = f"leftImg8bit/train/cityA/cityA_{i:06d}_leftImg8bit.png"
        lrel = rel.replace("leftImg8bit", "gtFine", 1).replace(
            "_leftImg8bit.png", "_gtFine_labelIds.png"
        )
        os.makedirs(os.path.dirname(f"{c}/{rel}"), exist_ok=True)
        os.makedirs(os.path.dirname(f"{c}/{lrel}"), exist_ok=True)
        img, lab = _synth_pair(rng, *tgt_wh)
        Image.fromarray(img).save(f"{c}/{rel}")
        Image.fromarray(lab).save(f"{c}/{lrel}")
        tr.append(rel)
    with open(f"{c}/train.txt", "w") as f:
        f.write("\n".join(tr))
    with open(stamp, "w") as f:
        f.write(want)
    return root


def _measure_h2d(batch, repeats: int = 4) -> float:
    """Approximate host->device bandwidth (MB/s) for one batch triple.

    Each transfer is fenced by a tiny jitted reduction read back to host
    (block_until_ready alone is not a fence through the axon relay). The
    ~30 ms fixed readback cost per fence is amortized over multi-100MB
    transfers; good to ~few % here.
    """
    import jax
    import jax.numpy as jnp

    tiny = jax.jit(lambda a: jnp.sum(a[0, :2, :2]))
    nbytes = sum(a.nbytes for a in batch)
    # distinct buffers per repeat: identical payloads could be de-duplicated
    # or cached by the relay layer
    variants = []
    for i in range(repeats):
        bs = [np.ascontiguousarray(a.copy()) for a in batch]
        bs[0].flat[i] = (int(bs[0].flat[i]) + 1) % 250
        variants.append(bs)
    # warm the executable
    _ = float(tiny(jax.device_put(batch[0])))
    t0 = time.perf_counter()
    for bs in variants:
        arrs = [jax.device_put(a) for a in bs]
        _ = float(tiny(arrs[0]))
    dt = time.perf_counter() - t0
    return repeats * nbytes / dt / 1e6


def _make_loaders(root: str, cfg, cache_root: str | None, num_workers: int):
    from maxsquareloss_tpu.data.cityscapes import CityscapesDataset
    from maxsquareloss_tpu.data.gta5 import GTA5Dataset
    from maxsquareloss_tpu.data.loader import SegDataLoader
    from maxsquareloss_tpu.data.transforms import TransformConfig

    src_t = TransformConfig(
        base_size=cfg.base_size, crop_size=cfg.crop_size,
        gaussian_blur=cfg.gaussian_blur, numpy_transform=cfg.numpy_transform,
        device_normalize=cfg.device_normalize,
    )
    tgt_t = TransformConfig(
        base_size=cfg.target_base_size, crop_size=cfg.target_crop_size,
        gaussian_blur=cfg.gaussian_blur, numpy_transform=cfg.numpy_transform,
        device_normalize=cfg.device_normalize,
    )
    src = GTA5Dataset(
        root=f"{root}/GTA5", list_path=f"{root}/GTA5/train.txt", split="train",
        transform_cfg=src_t,
        cache_dir=None if cache_root is None else f"{cache_root}/gta5",
    )
    tgt = CityscapesDataset(
        root=f"{root}/Cityscapes", list_path=f"{root}/Cityscapes/train.txt",
        split="train", transform_cfg=tgt_t,
        cache_dir=None if cache_root is None else f"{cache_root}/cs",
    )
    mk = lambda ds: SegDataLoader(
        ds, batch_size=cfg.batch_size, num_workers=num_workers, seed=cfg.seed
    )
    return mk(src), mk(tgt)


def _timed_epoch(step, state, src_loader, tgt_loader, epoch: int):
    """One full zipped epoch through device_prefetch; returns
    (state, imgs/sec, n_images, final_loss)."""
    import jax

    from maxsquareloss_tpu.data.loader import device_prefetch

    src_loader.set_epoch(epoch)
    tgt_loader.set_epoch(epoch)
    src = device_prefetch(iter(src_loader))
    tgt = device_prefetch(iter(tgt_loader))
    n_imgs = 0
    metrics = None
    t0 = time.perf_counter()
    last = None
    for (xs, ys, _), (xt, _, _) in zip(src, tgt):
        state, metrics = step(state, xs, ys, xt)
        n_imgs += xs.shape[0] + xt.shape[0]
        last = (xs, ys, xt)
    jax.block_until_ready(state.params)
    loss = float(np.asarray(metrics["loss"]))  # host readback fence
    dt = time.perf_counter() - t0
    return state, n_imgs / dt, n_imgs, loss, last


def run_e2e(args) -> dict:
    import jax

    from maxsquareloss_tpu.config import TrainConfig
    from maxsquareloss_tpu.models.deeplabv2 import init_deeplabv2
    from maxsquareloss_tpu.train.steps import (
        make_train_state,
        make_uda_train_step,
        model_config,
    )

    # tiny-scale overrides for the CPU plumbing test (tests/test_data.py)
    n = getattr(args, "n_per_domain", N_PER_DOMAIN)
    src_wh = getattr(args, "src_disk_wh", SRC_DISK_WH)
    tgt_wh = getattr(args, "tgt_disk_wh", TGT_DISK_WH)
    sizes = {}
    for k in ("base_size", "crop_size", "target_base_size", "target_crop_size"):
        if getattr(args, k, None) is not None:
            sizes[k] = tuple(getattr(args, k))
    root = ensure_dataset(args.data_root, n=n, src_wh=src_wh, tgt_wh=tgt_wh)
    cfg = TrainConfig(
        multi=True,
        num_classes=19,
        target_mode="IW_maxsquare",
        blocks=tuple(getattr(args, "blocks", (3, 4, 23, 3))),
        compute_dtype=args.dtype,
        remat=args.remat,
        xla_options=args.xla_options,
        batch_size=args.batch,
        data_parallel=False,
        gaussian_blur=True,
        # torchvision normalization: from a RANDOM init the caffe transform
        # (inputs +-128, no std division) diverges to NaN within an epoch —
        # same rationale as the e2e CLI tests. Host cost is equivalent.
        numpy_transform=False,
        device_normalize=getattr(args, "device_normalize", True),
        seed=0,
        **sizes,
    )
    params, frozen = init_deeplabv2(jax.random.key(0), model_config(cfg))
    state = make_train_state(params)
    step = make_uda_train_step(cfg, frozen)

    # Epoch-level rates on this 1-core VM vary ~±25% run to run (decode
    # threads + prefetch + device_put contend for one core), which can
    # invert the cold-vs-warm ordering in a single-epoch sample (VERDICT r3
    # weak #4 / #5): report the MEDIAN over >=3 timed epochs each, plus the
    # spread, so the published ordering is stable.
    epochs = max(1, int(getattr(args, "epochs", 3)))

    last = None  # final (xs, ys, xt) batch; feeds h2d + device-only legs

    def timed_leg(data_root, cache_root, first_epoch):
        """One warmup/priming epoch, then `epochs` timed ones.

        Returns (epoch rates, epoch images, last epoch's loss)."""
        nonlocal state, last
        s_l, t_l = _make_loaders(data_root, cfg, cache_root, args.num_workers)
        state, _, _, _, _ = _timed_epoch(step, state, s_l, t_l, first_epoch)
        rates, n, leg_loss = [], 0, float("nan")
        for e in range(first_epoch + 1, first_epoch + 1 + epochs):
            state, r, n, leg_loss, last = _timed_epoch(step, state, s_l, t_l, e)
            rates.append(r)
        return rates, n, leg_loss

    # cold: no cache, PNG decode + resize every epoch (epoch 0 = compile too).
    # final_loss in the artifact is the COLD leg's (the pre-round-4 meaning,
    # comparable across rounds; later legs keep training the same state).
    cold_rates, n_imgs, loss = timed_leg(root, None, 0)
    # warm: decoded-sample npz cache, primed by the leg's first epoch
    warm_rates, _, _ = timed_leg(root, os.path.join(root, "_cache"), 100)
    # prepared: tools/prepare_dataset.py pre-resized PNGs at base_size → the
    # fused C++ train fast path (no npz cache needed); the production
    # recommendation for static datasets (VERDICT r3 #6)
    from tools.prepare_dataset import prepare_split

    prep_root = root.rstrip("/") + "_prepared"
    prepare_split("gta5", f"{root}/GTA5", f"{root}/GTA5/train.txt",
                  f"{prep_root}/GTA5", tuple(cfg.base_size), "train",
                  num_workers=args.num_workers)
    prepare_split("cityscapes", f"{root}/Cityscapes",
                  f"{root}/Cityscapes/train.txt", f"{prep_root}/Cityscapes",
                  tuple(cfg.target_base_size), "train",
                  num_workers=args.num_workers)
    prep_rates, _, _ = timed_leg(prep_root, None, 200)

    # raw-format prepared root (--format raw): .npy pixel sidecars, no PNG
    # decode at all — the fastest host path (late round 4)
    raw_root = root.rstrip("/") + "_prepared_raw"
    prepare_split("gta5", f"{root}/GTA5", f"{root}/GTA5/train.txt",
                  f"{raw_root}/GTA5", tuple(cfg.base_size), "train",
                  num_workers=args.num_workers, fmt="raw")
    prepare_split("cityscapes", f"{root}/Cityscapes",
                  f"{root}/Cityscapes/train.txt", f"{raw_root}/Cityscapes",
                  tuple(cfg.target_base_size), "train",
                  num_workers=args.num_workers, fmt="raw")
    raw_rates, _, _ = timed_leg(raw_root, None, 300)

    cold_rate = float(np.median(cold_rates))
    warm_rate = float(np.median(warm_rates))
    prep_rate = float(np.median(prep_rates))
    raw_rate = float(np.median(raw_rates))

    # --- host->device transfer attribution (the tunnel is this box's
    # bottleneck; a real TPU host has local PCIe)
    xs_h, ys_h, xt_h = (np.asarray(a) for a in last)
    h2d_mbps = _measure_h2d([xs_h, ys_h, xt_h])
    bytes_per_step = xs_h.nbytes + ys_h.nbytes + xt_h.nbytes

    # --- device-only ceiling: same compiled step, device-resident batch
    xs, ys, xt = last
    for _ in range(2):
        state, metrics = step(state, xs, ys, xt)
    jax.block_until_ready(state.params)
    k = 6
    t0 = time.perf_counter()
    for _ in range(k):
        state, metrics = step(state, xs, ys, xt)
    jax.block_until_ready(state.params)
    _ = float(np.asarray(metrics["loss"]))
    dev_rate = k * (xs.shape[0] + xt.shape[0]) / (time.perf_counter() - t0)

    n_chips = max(jax.device_count(), 1)
    per_chip = warm_rate / n_chips
    from bench import COMPARATOR_PROVENANCE

    return {
        "metric": (
            f"e2e_uda_images_per_sec_per_chip_src{cfg.base_size[0]}x"
            f"{cfg.base_size[1]}_tgt{cfg.target_base_size[0]}x"
            f"{cfg.target_base_size[1]}_{args.dtype}"
        ),
        "value": round(per_chip, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / args.comparator, 3),
        "extra": {
            "e2e_cold_imgs_per_sec": round(cold_rate / n_chips, 3),
            "e2e_warm_imgs_per_sec": round(warm_rate / n_chips, 3),
            "e2e_prepared_imgs_per_sec": round(prep_rate / n_chips, 3),
            "e2e_prepared_raw_imgs_per_sec": round(raw_rate / n_chips, 3),
            "timed_epochs_each": epochs,
            "e2e_cold_epoch_rates": [round(r / n_chips, 3) for r in cold_rates],
            "e2e_warm_epoch_rates": [round(r / n_chips, 3) for r in warm_rates],
            "e2e_prepared_epoch_rates": [round(r / n_chips, 3) for r in prep_rates],
            "e2e_prepared_raw_epoch_rates": [round(r / n_chips, 3) for r in raw_rates],
            "device_only_imgs_per_sec": round(dev_rate / n_chips, 3),
            "host_device_ratio_warm": round(warm_rate / dev_rate, 3),
            "h2d_MB_per_sec": round(h2d_mbps, 1),
            "h2d_MB_per_step": round(bytes_per_step / 1e6, 1),
            "device_normalize": bool(cfg.device_normalize),
            "epoch_images": n_imgs,
            "num_workers": args.num_workers,
            "final_loss": round(loss, 4),
            "chips": n_chips,
            "platform": jax.devices()[0].platform,
            "device_kind": jax.devices()[0].device_kind,
            "comparator_imgs_per_sec": args.comparator,
            "comparator_provenance": COMPARATOR_PROVENANCE,
            "note": (
                "1-core dev VM: host pipeline threads cannot scale here; "
                "see BASELINE.md 'End-to-end throughput' for the multi-core "
                "extrapolation"
            ),
        },
    }


if __name__ == "__main__":
    # standalone CPU smoke: tiny backbone, CPU devices
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--data_root", default="/tmp/bench_e2e_data")
    p.add_argument("--epochs", type=int, default=3,
                   help="timed epochs per leg (median reported)")
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--remat", default="")
    p.add_argument("--xla_options", default="auto")
    p.add_argument("--comparator", type=float, default=15.0)
    print(json.dumps(run_e2e(p.parse_args())))

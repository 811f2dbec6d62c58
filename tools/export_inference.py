"""Export the inference graph as a portable serialized StableHLO artifact.

A TPU-native serving path the reference lacks entirely (its deployment
story is "load the .pth in another torch process"): the single/multi-scale
(+flip) prediction function — uint8 NHWC batch in, int32 trainId map out,
normalization and TTA baked into the graph, parameters embedded as
constants — is exported with ``jax.export`` to a self-contained artifact
that any JAX process (or anything that consumes StableHLO) can load and
run WITHOUT this framework, its config system, or the checkpoint format:

    # export (params from an orbax dir or a reference-layout .pth)
    python tools/export_inference.py --pretrained_ckpt_file runs/x/checkpoint_best \
        --output serve/model --hw 512,1024 --batch_size 16 \
        --compute_dtype bfloat16 [--scales 0.75,1.0,1.25 --flip true]

    # verify an artifact: deserialize, run, compare against the live graph
    python tools/export_inference.py --load serve/model --selftest ...

    # consume anywhere (no maxsquareloss_tpu import needed):
    from jax import export
    fn = export.deserialize(open("serve/model.stablehlo", "rb").read())
    trainids = fn.call(uint8_batch)          # (N, H, W) int32, -1 = ignore

The artifact targets BOTH cpu and tpu platforms (one file serves local
smoke tests and fleet deployment). Input resolution/batch are static —
the serving contract (recorded in the sidecar model.json); evaluation
metrics are batch-invariant and batch 16 is the measured throughput
sweet spot on v5e (BASELINE.md "Eval batch size").
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export

from maxsquareloss_tpu.config import TrainConfig, str2bool
from maxsquareloss_tpu.train.steps import _prepare_inputs


def load_params(cfg: TrainConfig):
    """Checkpoint (orbax dir or reference .pth) → (params, frozen)."""
    from tools.common import load_inference_params

    return load_inference_params(cfg)


def embed_cast(tree, dtype):
    """Pre-cast fp32 leaves to the compute dtype before embedding.

    ``apply_deeplabv2`` casts every weight to the activation dtype at its
    single point of use (``layers.py`` conv2d / frozen_bn ``.astype(
    x.dtype)``), so embedding bf16 constants is BIT-IDENTICAL to embedding
    fp32 ones under bfloat16 compute — the fp32→bf16 round-to-nearest-even
    happens exactly once either way — while halving the artifact (the
    parameter constants are ~all of its bytes) and the serving process's
    param memory. Pinned by tests/test_export_inference.py.
    """
    def cast(path, a):
        if a.dtype != jnp.float32:
            return a  # int8 weights, etc.
        if path and getattr(path[-1], "key", None) in ("oscale", "ascale_inv"):
            # int8 dequant scales must stay f32: the quantized conv applies
            # them in f32 (1-ulp scale error); bf16 storage would inject
            # ~0.4% scale noise into every backbone conv output
            return a
        return a.astype(dtype)

    return jax.tree_util.tree_map_with_path(cast, tree)


def make_serving_fn(cfg: TrainConfig, params, frozen, scales, flip, out_hw):
    """uint8 (or pre-normalized f32) NHWC batch → int32 trainIds.

    Parameters are closed over (embedded as StableHLO constants); the
    normalization (`cfg.numpy_transform` caffe or torchvision — the exact
    `_prepare_inputs` the training step uses) runs in-graph, so the caller
    ships raw decoded pixels.
    """
    from tools.predict import make_predict_fn

    core = make_predict_fn(cfg, frozen, scales, flip, out_hw)

    def serve(x):
        x, _ = _prepare_inputs(x, None, cfg)
        return core(params, x)

    return serve


def main(argv=None):
    p = argparse.ArgumentParser("export_inference")
    p.add_argument("--pretrained_ckpt_file", default=None,
                   help="orbax checkpoint dir or reference-layout .pth")
    p.add_argument("--output", default=None,
                   help="artifact basename; writes <output>.stablehlo + .json")
    p.add_argument("--load", default=None,
                   help="verify an existing artifact basename instead")
    p.add_argument("--selftest", action="store_true",
                   help="with --load: run the artifact on a random batch and "
                        "compare bit-for-bit against the live graph")
    p.add_argument("--hw", default="512,1024", help="input H,W (static)")
    p.add_argument("--out_hw", default=None,
                   help="output label H,W (default = --hw); full-res "
                        "protocol: 1024,2048")
    p.add_argument("--batch_size", type=int, default=16,
                   help="static serving batch (16 = measured v5e sweet spot)")
    p.add_argument("--num_classes", type=int, default=19)
    p.add_argument("--multi", type=str2bool, default=True)
    p.add_argument("--blocks", default="3,4,23,3")
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=("float32", "bfloat16"))
    p.add_argument("--numpy_transform", type=str2bool, default=True)
    p.add_argument("--scales", default="1.0")
    p.add_argument("--flip", type=str2bool, default=False)
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma list of target platforms for the artifact")
    p.add_argument("--embed_dtype", default="compute",
                   choices=("compute", "float32"),
                   help="dtype of the embedded parameter constants: "
                        "'compute' (default) stores bf16 params when "
                        "--compute_dtype bfloat16 — bit-identical outputs "
                        "(the graph casts weights to the activation dtype "
                        "anyway) at half the artifact size; 'float32' "
                        "keeps fp32 constants")
    p.add_argument("--quantize", default="", choices=("", "int8"),
                   help="post-training int8: backbone convs run int8 on the "
                        "MXU inside the artifact (heads stay fp). Needs "
                        "--calib_images; the calibration amax per conv site "
                        "is recorded in the sidecar so --selftest can "
                        "rebuild the identical live graph")
    p.add_argument("--calib_images", default="",
                   help="glob of calibration images for --quantize int8 "
                        "(resized to --hw; first 16 matches used)")
    p.add_argument("--sp", type=int, default=1,
                   help="spatial partitioning: export the graph sharded over "
                        "a (1, sp) 'space' mesh (image height split across "
                        "sp devices, GSPMD halo exchanges baked into the "
                        "artifact). Serve batch-1 full-res requests on an "
                        "sp-chip slice; the consumer must device_put inputs "
                        "with the matching sharding (see sidecar). 1 = off")
    args = p.parse_args(argv)

    if args.sp > 1 and args.quantize:
        # reject UP FRONT (same gate as config_from_args), before the
        # checkpoint load and the minutes-long calibration pass: GSPMD
        # cannot pad int8 conv halos in this XLA version (mistyped Pad
        # constant)
        p.error(f"--quantize {args.quantize} does not compose with --sp: "
                "XLA's GSPMD partitioner cannot pad int8 conv halos in "
                "this version")

    from maxsquareloss_tpu.utils.runtime import setup_compilation_cache

    setup_compilation_cache("auto")

    h, w = (int(v) for v in args.hw.split(","))
    oh, ow = (int(v) for v in (args.out_hw or args.hw).split(","))
    scales = tuple(float(s) for s in args.scales.split(","))
    cfg = TrainConfig(
        num_classes=args.num_classes,
        multi=args.multi,
        blocks=tuple(int(v) for v in args.blocks.split(",")),
        compute_dtype=args.compute_dtype,
        numpy_transform=args.numpy_transform,
        device_normalize=True,  # serving contract: raw uint8 in
        pretrained_ckpt_file=args.pretrained_ckpt_file,
        data_parallel=False,
    )
    in_spec = jax.ShapeDtypeStruct((args.batch_size, h, w, 3), jnp.uint8)

    if args.load:
        with open(args.load + ".stablehlo", "rb") as f:
            art = jax_export.deserialize(f.read())
        meta = json.load(open(args.load + ".json"))
        print(f"loaded {args.load}.stablehlo: platforms={art.platforms} "
              f"in={meta['input_shape']} out_hw={meta['out_hw']}")
        if args.selftest:
            if not args.pretrained_ckpt_file:
                p.error("--selftest needs --pretrained_ckpt_file to rebuild "
                        "the live graph")
            # rebuild the live reference graph from the artifact's OWN
            # sidecar, not from CLI flags: re-typing the export flags
            # wrongly would either fail spuriously or silently verify
            # against a different graph (round-4 review finding)
            cfg = TrainConfig(
                num_classes=meta["num_classes"],
                multi=meta["multi"],
                blocks=tuple(meta["blocks"]),
                compute_dtype=meta["compute_dtype"],
                numpy_transform=meta["normalization"] == "caffe BGR-mean",
                device_normalize=True,
                pretrained_ckpt_file=args.pretrained_ckpt_file,
                data_parallel=False,
            )
            params, frozen = load_params(cfg)
            if meta.get("quantize") == "int8":
                # deterministic rebuild: same fp params + the sidecar's own
                # calibration amax => bit-identical int8 weights and scales
                from maxsquareloss_tpu.models.quantize import quantize_params

                params = quantize_params(params, meta["calib_amax"])
            serve = make_serving_fn(
                cfg, params, frozen, tuple(meta["scales"]), meta["flip"],
                tuple(meta["out_hw"]),
            )
            rng = np.random.default_rng(0)
            x = rng.integers(0, 256, size=tuple(meta["input_shape"])).astype(
                np.uint8
            )
            sp = int(meta.get("sp", 1))
            if sp > 1:
                # sharded artifact: inputs must live on an sp-device
                # (1, sp) mesh; the live reference graph stays 1-device
                from maxsquareloss_tpu.parallel.mesh import (
                    batch_sharding,
                    make_mesh,
                )

                mesh = make_mesh(data_parallel=False, sp=sp)
                got = np.asarray(
                    art.call(jax.device_put(x, batch_sharding(mesh)))
                )
            else:
                got = np.asarray(art.call(x))
            want = np.asarray(jax.jit(serve)(x))
            np.testing.assert_array_equal(got, want)
            print(f"selftest OK: artifact == live graph on "
                  f"{meta['input_shape']}" + (f" (sp={sp})" if sp > 1 else "")
                  + " (exact)")
        return

    if not (args.pretrained_ckpt_file and args.output):
        p.error("--pretrained_ckpt_file and --output are required for export")
    params, frozen = load_params(cfg)
    quant_amax = None
    if args.quantize == "int8":
        import glob as globlib

        from PIL import Image

        from maxsquareloss_tpu.models.quantize import calibrate, quantize_params

        files = sorted(globlib.glob(args.calib_images))
        if not files:
            p.error("--quantize int8 needs --calib_images matching >=1 file")

        def calib_batches():
            for fp in files[:16]:
                pil = Image.open(fp).convert("RGB")
                if pil.size != (w, h):
                    pil = pil.resize((w, h), Image.BICUBIC)
                # serving contract is raw uint8 in; calibrate() applies the
                # same in-graph normalization the artifact will
                yield np.asarray(pil, np.uint8)[None]

        quant_amax = calibrate(params, frozen, cfg, calib_batches())
        params = quantize_params(params, quant_amax)
        print(f"int8 PTQ: calibrated {len(quant_amax)} conv sites on "
              f"{min(len(files), 16)} images; backbone convs now int8")
    embedded = "float32"
    if args.embed_dtype == "compute" and args.compute_dtype == "bfloat16":
        params, frozen = embed_cast(params, jnp.bfloat16), embed_cast(
            frozen, jnp.bfloat16
        )
        embedded = "bfloat16"
    serve = make_serving_fn(cfg, params, frozen, scales, args.flip, (oh, ow))
    if args.sp > 1:
        # sharded serving artifact: jit over a (1, sp) pure-SP mesh so the
        # exported StableHLO carries the GSPMD partitioning + halo
        # exchanges; callers run it on any sp-device slice (bit-equal to
        # the single-device graph — tests/test_export_inference.py)
        if h % args.sp:
            p.error(f"--sp {args.sp} must divide the input height {h}")
        from maxsquareloss_tpu.parallel.mesh import batch_sharding, make_mesh

        mesh = make_mesh(data_parallel=False, sp=args.sp)
        jit_serve = jax.jit(
            serve,
            in_shardings=batch_sharding(mesh),
            out_shardings=jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec()
            ),
        )
    else:
        jit_serve = jax.jit(serve)
    exp = jax_export.export(
        jit_serve,
        platforms=tuple(s.strip() for s in args.platforms.split(",")),
    )(in_spec)
    blob = exp.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    with open(args.output + ".stablehlo", "wb") as f:
        f.write(blob)
    meta = {
        "input_shape": list(in_spec.shape),
        "input_dtype": "uint8",
        "output": "int32 trainIds (N, out_h, out_w); -1 = ignore",
        "out_hw": [oh, ow],
        "num_classes": args.num_classes,
        "multi": args.multi,
        "blocks": list(cfg.blocks),
        "normalization": "caffe BGR-mean" if args.numpy_transform
                         else "torchvision mean/std",
        "compute_dtype": args.compute_dtype,
        "embed_dtype": embedded,
        "scales": list(scales),
        "flip": args.flip,
        "platforms": list(exp.platforms),
        "sp": args.sp,
        "quantize": args.quantize,
        # per-site activation amax: lets --selftest (and any auditor)
        # reproduce the embedded int8 weights/scales from the fp checkpoint
        **({"calib_amax": quant_amax} if quant_amax is not None else {}),
        "consume": (
            "jax.export.deserialize(blob).call(uint8_batch)" if args.sp <= 1
            else f"needs {args.sp} devices: mesh=Mesh(devices[:{args.sp}]"
                 f".reshape(1,{args.sp}), ('data','space')); "
                 "fn.call(device_put(uint8_batch, "
                 "NamedSharding(mesh, P(('data',), 'space'))))"
        ),
    }
    with open(args.output + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    print(f"wrote {args.output}.stablehlo ({len(blob) / 1e6:.1f} MB, "
          f"platforms {exp.platforms}) + {args.output}.json")


if __name__ == "__main__":
    main()

"""Serving export (tools/export_inference.py): serialized StableHLO artifact
round-trips and matches the live inference graph exactly."""

import json
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, ".")

from maxsquareloss_tpu.config import TrainConfig
from maxsquareloss_tpu.models.deeplabv2 import init_deeplabv2
from maxsquareloss_tpu.optim import init_sgd
from maxsquareloss_tpu.train import checkpoint as ckpt_lib
from maxsquareloss_tpu.train.steps import TrainState, model_config

SMALL = (1, 1, 2, 1)


@pytest.fixture(scope="module")
def small_ckpt(tmp_path_factory):
    cfg = TrainConfig(blocks=SMALL, data_parallel=False)
    params, frozen = init_deeplabv2(jax.random.key(3), model_config(cfg))
    state = TrainState(params=params, opt=init_sgd(params),
                       iteration=jax.numpy.asarray(0, jax.numpy.int32))
    d = tmp_path_factory.mktemp("export_ckpt")
    ckpt_lib.save_checkpoint(str(d), state, frozen, epoch=0, best_miou=0.0,
                             wait=True)
    return str(d / "checkpoint_latest")


def test_export_roundtrip_exact(tmp_path, small_ckpt, rng):
    from jax import export as jax_export

    from tools.export_inference import main

    out = str(tmp_path / "serve" / "model")
    main([
        "--pretrained_ckpt_file", small_ckpt, "--output", out,
        "--hw", "32,64", "--batch_size", "2", "--blocks", "1,1,2,1",
        "--compute_dtype", "float32", "--platforms", "cpu",
        "--scales", "0.75,1.0", "--flip", "true",
    ])
    meta = json.load(open(out + ".json"))
    assert meta["input_shape"] == [2, 32, 64, 3]
    assert meta["flip"] is True and meta["scales"] == [0.75, 1.0]

    with open(out + ".stablehlo", "rb") as f:
        art = jax_export.deserialize(f.read())
    x = rng.integers(0, 256, size=(2, 32, 64, 3)).astype(np.uint8)
    got = np.asarray(art.call(x))
    assert got.shape == (2, 32, 64) and got.dtype == np.int32
    assert got.min() >= 0 and got.max() < 19

    # the artifact must equal the live graph bit for bit (cpu platform)
    from maxsquareloss_tpu.config import TrainConfig as TC
    from tools.export_inference import load_params, make_serving_fn

    cfg = TC(blocks=SMALL, compute_dtype="float32", device_normalize=True,
             pretrained_ckpt_file=small_ckpt, data_parallel=False)
    params, frozen = load_params(cfg)
    serve = make_serving_fn(cfg, params, frozen, (0.75, 1.0), True, (32, 64))
    want = np.asarray(jax.jit(serve)(x))
    np.testing.assert_array_equal(got, want)


def test_export_selftest_cli(tmp_path, small_ckpt):
    """--load --selftest rebuilds the live graph from the artifact's OWN
    sidecar — no export flags re-typed (blocks/out_hw/scales/flip here all
    differ from the CLI defaults, so using defaults would fail or verify
    the wrong graph — round-4 review finding)."""
    from tools.export_inference import main

    out = str(tmp_path / "m")
    main(["--pretrained_ckpt_file", small_ckpt, "--output", out,
          "--hw", "16,32", "--out_hw", "32,64", "--batch_size", "1",
          "--blocks", "1,1,2,1", "--compute_dtype", "float32",
          "--platforms", "cpu", "--scales", "0.75,1.0", "--flip", "true"])
    main(["--load", out, "--selftest", "--pretrained_ckpt_file", small_ckpt])


def test_export_bf16_embedded_params(tmp_path, small_ckpt, rng):
    """--embed_dtype compute (default) stores bf16 parameter constants when
    compute is bfloat16: bit-identical outputs to the fp32-embedded artifact
    (the graph casts weights to the activation dtype at their single point
    of use, so the fp32->bf16 rounding happens exactly once either way) at
    roughly half the serialized size."""
    import os

    from jax import export as jax_export

    from tools.export_inference import main

    common = ["--pretrained_ckpt_file", small_ckpt, "--hw", "32,64",
              "--batch_size", "2", "--blocks", "1,1,2,1",
              "--compute_dtype", "bfloat16", "--platforms", "cpu"]
    out16 = str(tmp_path / "m_bf16")
    out32 = str(tmp_path / "m_fp32")
    main(common + ["--output", out16])
    main(common + ["--output", out32, "--embed_dtype", "float32"])
    meta16 = json.load(open(out16 + ".json"))
    meta32 = json.load(open(out32 + ".json"))
    assert meta16["embed_dtype"] == "bfloat16"
    assert meta32["embed_dtype"] == "float32"

    s16 = os.path.getsize(out16 + ".stablehlo")
    s32 = os.path.getsize(out32 + ".stablehlo")
    assert s16 < 0.65 * s32, (s16, s32)  # params dominate the artifact

    x = rng.integers(0, 256, size=(2, 32, 64, 3)).astype(np.uint8)
    with open(out16 + ".stablehlo", "rb") as f:
        a16 = jax_export.deserialize(f.read())
    with open(out32 + ".stablehlo", "rb") as f:
        a32 = jax_export.deserialize(f.read())
    np.testing.assert_array_equal(np.asarray(a16.call(x)),
                                  np.asarray(a32.call(x)))

    # the CLI selftest (live graph rebuilt with fp32 params) also passes
    main(["--load", out16, "--selftest", "--pretrained_ckpt_file",
          small_ckpt])


def test_export_spatial_partitioned_artifact(tmp_path, small_ckpt, rng):
    """--sp 4: the artifact carries the GSPMD (1, 4) 'space' partitioning
    (image height split across 4 devices, halo exchanges baked in) and is
    bit-equal to the single-device live graph — the multi-chip batch-1
    serving contract. The --load --selftest flow shards inputs per the
    sidecar's sp field."""
    from jax import export as jax_export

    from maxsquareloss_tpu.parallel.mesh import batch_sharding, make_mesh
    from tools.export_inference import main

    out = str(tmp_path / "msp")
    main(["--pretrained_ckpt_file", small_ckpt, "--output", out,
          "--hw", "32,64", "--batch_size", "1", "--blocks", "1,1,2,1",
          "--compute_dtype", "float32", "--platforms", "cpu", "--sp", "4"])
    meta = json.load(open(out + ".json"))
    assert meta["sp"] == 4 and "4 devices" in meta["consume"]

    with open(out + ".stablehlo", "rb") as f:
        art = jax_export.deserialize(f.read())
    assert art.nr_devices == 4
    mesh = make_mesh(data_parallel=False, sp=4)
    x = rng.integers(0, 256, size=(1, 32, 64, 3)).astype(np.uint8)
    got = np.asarray(art.call(jax.device_put(x, batch_sharding(mesh))))

    from maxsquareloss_tpu.config import TrainConfig as TC
    from tools.export_inference import load_params, make_serving_fn

    cfg = TC(blocks=SMALL, compute_dtype="float32", device_normalize=True,
             pretrained_ckpt_file=small_ckpt, data_parallel=False)
    params, frozen = load_params(cfg)
    serve = make_serving_fn(cfg, params, frozen, (1.0,), False, (32, 64))
    np.testing.assert_array_equal(got, np.asarray(jax.jit(serve)(x)))

    # the CLI selftest flow handles the sharded artifact end to end
    main(["--load", out, "--selftest", "--pretrained_ckpt_file", small_ckpt])


def test_export_quantized_int8_artifact(tmp_path, small_ckpt, rng):
    """--quantize int8: the artifact embeds int8 backbone convs calibrated
    on the --calib_images glob; the sidecar records quantize + per-site
    calib_amax so --selftest deterministically rebuilds the identical
    quantized live graph from the fp checkpoint (exact comparison)."""
    from PIL import Image

    from jax import export as jax_export

    from tools.export_inference import main

    for i in range(3):  # calibration images at a non-export size (resized)
        arr = rng.integers(0, 256, size=(40, 70, 3)).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f"calib_{i}.png")

    out = str(tmp_path / "mq")
    main(["--pretrained_ckpt_file", small_ckpt, "--output", out,
          "--hw", "32,64", "--batch_size", "2", "--blocks", "1,1,2,1",
          "--compute_dtype", "float32", "--platforms", "cpu",
          "--quantize", "int8",
          "--calib_images", str(tmp_path / "calib_*.png")])
    meta = json.load(open(out + ".json"))
    assert meta["quantize"] == "int8"
    assert meta["calib_amax"] and all(v > 0 for v in meta["calib_amax"].values())

    with open(out + ".stablehlo", "rb") as f:
        art = jax_export.deserialize(f.read())
    x = rng.integers(0, 256, size=(2, 32, 64, 3)).astype(np.uint8)
    got = np.asarray(art.call(x))
    assert got.shape == (2, 32, 64) and got.dtype == np.int32

    # selftest: rebuild the quantized live graph from the sidecar amax
    main(["--load", out, "--selftest", "--pretrained_ckpt_file", small_ckpt])

    # quantized argmax maps stay close to the fp artifact's
    outf = str(tmp_path / "mf")
    main(["--pretrained_ckpt_file", small_ckpt, "--output", outf,
          "--hw", "32,64", "--batch_size", "2", "--blocks", "1,1,2,1",
          "--compute_dtype", "float32", "--platforms", "cpu"])
    with open(outf + ".stablehlo", "rb") as f:
        fp_art = jax_export.deserialize(f.read())
    agree = (np.asarray(fp_art.call(x)) == got).mean()
    assert agree > 0.9, agree

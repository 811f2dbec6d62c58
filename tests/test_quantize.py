"""Post-training int8 quantization (models/quantize.py).

Beyond-parity serving feature (the reference is pure-fp32 torch), so there
is no torch oracle; the gates are internal instead:

- the int8 conv's integer core is EXACT (int8 x int8 -> int32), so a site
  whose inputs/weights are already representable quantizes losslessly;
- calibrate() sees every backbone site exactly once per forward and
  records true input amaxes;
- the quantized tree is a structural drop-in: heads stay fp, training
  params untouched, and the full model forward stays close to fp.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maxsquareloss_tpu.config import TrainConfig
from maxsquareloss_tpu.models.deeplabv2 import apply_deeplabv2, init_deeplabv2
from maxsquareloss_tpu.models.layers import conv2d, conv_site, qconv2d
from maxsquareloss_tpu.models.quantize import (
    calibrate,
    iter_conv_sites,
    parse_calib_mode,
    quantize_params,
    _quantize_site,
)
from maxsquareloss_tpu.train.steps import model_config

SMALL = (1, 1, 2, 1)


def small_cfg(**kw):
    return TrainConfig(
        num_classes=19, multi=True, blocks=SMALL, compute_dtype="float32", **kw
    )


def small_model(seed=0, **kw):
    cfg = small_cfg(**kw)
    mcfg = model_config(cfg, eval_mode=True)
    params, frozen = init_deeplabv2(jax.random.key(seed), mcfg)
    return cfg, mcfg, params, frozen


def test_qconv2d_exact_on_representable_grid(rng):
    # weights and activations already on the int8 grid => quantization is
    # a bijection and the int32 conv core is exact arithmetic
    wq = rng.integers(-127, 128, size=(3, 3, 8, 16)).astype(np.int8)
    s_w = np.full((16,), 0.5, np.float32)
    s_a = 0.25
    xq = rng.integers(-127, 128, size=(2, 10, 12, 8)).astype(np.int8)
    x = jnp.asarray(xq.astype(np.float32) * s_a)
    site = {
        "w": jnp.asarray(wq),
        "oscale": jnp.asarray(s_w * s_a, jnp.float32),
        "ascale_inv": jnp.asarray(1.0 / s_a, jnp.float32),
    }
    got = np.asarray(qconv2d(x, site, padding=1))
    want = np.asarray(
        conv2d(x, jnp.asarray(wq.astype(np.float32) * s_w), padding=1)
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)


def test_quantize_site_roundtrip_error_bound(rng):
    # generic fp weights/activations: per-channel weight quant + per-tensor
    # activation quant keeps the conv output within the standard PTQ bound
    w = rng.standard_normal((3, 3, 16, 32)).astype(np.float32)
    x = rng.standard_normal((2, 14, 14, 16)).astype(np.float32) * 3.0
    site = _quantize_site({"w": jnp.asarray(w)}, float(np.abs(x).max()))
    got = np.asarray(qconv2d(jnp.asarray(x), site, padding=1))
    want = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), padding=1))
    denom = np.abs(want).max()
    assert np.abs(got - want).max() / denom < 0.02, (
        np.abs(got - want).max() / denom
    )


def test_conv_site_dispatch(rng):
    # fp site -> exact conv2d; int8 site -> qconv2d path
    w = rng.standard_normal((1, 1, 4, 8)).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 4)).astype(np.float32))
    fp = np.asarray(conv_site(x, {"w": jnp.asarray(w)}))
    np.testing.assert_array_equal(fp, np.asarray(conv2d(x, jnp.asarray(w))))
    qsite = _quantize_site({"w": jnp.asarray(w)}, float(np.abs(x).max()))
    assert qsite["w"].dtype == jnp.int8
    q = np.asarray(conv_site(x, qsite))
    np.testing.assert_array_equal(q, np.asarray(qconv2d(x, qsite)))


def test_calibrate_covers_every_site(rng):
    cfg, mcfg, params, frozen = small_model()
    x = rng.standard_normal((1, 65, 65, 3)).astype(np.float32)
    amax = calibrate(params, frozen, cfg, [x], mcfg=mcfg)
    sites = dict(iter_conv_sites(params))
    assert set(amax) == set(sites)
    assert all(v > 0 for v in amax.values())
    # heads are not calibration targets
    assert not any(p.startswith(("layer5", "layer6")) for p in amax)


def test_parse_calib_mode():
    assert parse_calib_mode("amax") is None
    assert parse_calib_mode("p99.9") == 99.9
    assert parse_calib_mode("p999") == 99.9      # digit shorthand
    assert parse_calib_mode("p9999") == 99.99
    assert parse_calib_mode("p50") == 50.0
    for bad in ("max", "p0", "p-5", "q99"):
        with pytest.raises(ValueError):
            parse_calib_mode(bad)


def test_percentile_calibration_clips_outliers(rng):
    # --calib_mode p<q> (VERDICT r4 next #2b): the percentile statistic must
    # ignore a single hot activation that amax calibration would let stretch
    # the whole tensor's quantization grid.
    cfg, mcfg, params, frozen = small_model()
    x = rng.standard_normal((1, 65, 65, 3)).astype(np.float32)
    x_hot = x.copy()
    x_hot[0, 0, 0, 0] = 1e4  # one outlier pixel
    a_amax = calibrate(params, frozen, cfg, [x_hot], mcfg=mcfg, mode="amax")
    a_pct = calibrate(params, frozen, cfg, [x_hot], mcfg=mcfg, mode="p99.9")
    a_ref = calibrate(params, frozen, cfg, [x], mcfg=mcfg, mode="p99.9")
    # amax at the input conv explodes with the outlier; p99.9 stays at the
    # clean data's scale
    assert a_amax["conv1"] > 100 * a_pct["conv1"]
    assert a_pct["conv1"] < 3 * a_ref["conv1"]
    # both produce a valid drop-in int8 tree
    qp = quantize_params(params, a_pct)
    assert qp["conv1"]["w"].dtype == jnp.int8


def test_quantize_params_structure_and_missing_site(rng):
    cfg, mcfg, params, frozen = small_model()
    x = rng.standard_normal((1, 65, 65, 3)).astype(np.float32)
    amax = calibrate(params, frozen, cfg, [x], mcfg=mcfg)
    qp = quantize_params(params, amax)
    # every backbone site int8 + scales; heads untouched fp
    for path, site in iter_conv_sites(qp):
        assert site["w"].dtype == jnp.int8, path
        assert set(site) == {"w", "oscale", "ascale_inv"}, path
    assert qp["layer5"] is params["layer5"]
    assert qp["layer6"] is params["layer6"]
    # original tree untouched (training params are never quantized in place)
    assert params["conv1"]["w"].dtype == jnp.float32
    with pytest.raises(ValueError, match="no calibration amax"):
        quantize_params(params, {k: v for k, v in amax.items()
                                 if k != "conv1"})


def test_quantized_forward_close_to_fp(rng):
    # end-to-end drop-in: the SAME apply_deeplabv2 runs the int8 tree; the
    # logits stay close to fp and the argmax map barely moves
    cfg, mcfg, params, frozen = small_model()
    xs = [rng.standard_normal((2, 65, 65, 3)).astype(np.float32)
          for _ in range(2)]
    amax = calibrate(params, frozen, cfg, xs, mcfg=mcfg)
    qp = quantize_params(params, amax)

    fwd = jax.jit(lambda p, x: apply_deeplabv2(p, frozen, x, mcfg))
    x = jnp.asarray(xs[0])
    fp_aux, fp_main = fwd(params, x)
    q_aux, q_main = fwd(qp, x)
    for fp_y, q_y in [(fp_main, q_main), (fp_aux, q_aux)]:
        fp_y, q_y = np.asarray(fp_y), np.asarray(q_y)
        rel = np.abs(q_y - fp_y).max() / np.abs(fp_y).max()
        assert rel < 0.15, rel
        agree = (fp_y.argmax(-1) == q_y.argmax(-1)).mean()
        assert agree > 0.95, agree


def test_quantize_from_loader_glue(rng):
    # CLI glue: consumes (xs, ys, names) batches, respects calib_batches
    cfg, mcfg, params, frozen = small_model()
    cfg = small_cfg(calib_batches=2)
    seen = []

    class FakeLoader:
        def __iter__(self):
            for i in range(5):
                seen.append(i)
                xs = rng.standard_normal((1, 65, 65, 3)).astype(np.float32)
                yield xs, np.zeros((1, 65, 65), np.int8), [f"s{i}"]

    from maxsquareloss_tpu.models.quantize import quantize_from_loader

    qp = quantize_from_loader(cfg, params, frozen, FakeLoader())
    assert qp["conv1"]["w"].dtype == jnp.int8
    assert seen == [0, 1]  # only calib_batches batches consumed


def test_amax_sync_across_processes(monkeypatch):
    """Multi-host calibration: loader shards differ per process, so the
    per-site amax must be allgather-maxed — otherwise every process builds
    a DIFFERENT int8 tree and 'replicated' params silently disagree across
    hosts. Single-process is a pass-through (no collective)."""
    from jax.experimental import multihost_utils

    from maxsquareloss_tpu.models.quantize import sync_amax_across_processes

    local = {"conv1": 1.0, "layer1.0.conv2": 3.0}
    assert sync_amax_across_processes(local) == local  # 1 process: untouched

    calls = []

    def fake_allgather(vec):
        calls.append(np.asarray(vec))
        # the other process saw larger conv1, smaller layer1.0.conv2;
        # element 0 is its had-batches flag
        other = {"conv1": 2.5, "layer1.0.conv2": 0.5}
        return np.stack([np.asarray(vec),
                         np.asarray([1.0] + [other[k] for k in sorted(local)],
                                    np.float32)])

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(multihost_utils, "process_allgather", fake_allgather)
    synced = sync_amax_across_processes(local)
    assert len(calls) == 1
    # vec[0] is the had-batches flag (hang-safety for empty shards)
    assert calls[0][0] == 1.0
    assert synced == {"conv1": 2.5, "layer1.0.conv2": 3.0}


def test_amax_sync_empty_shard_is_hang_safe(monkeypatch):
    """A process whose val shard yields no batches must still reach the
    allgather (contributing zeros + a had-batches=0 flag) so siblings do
    not block forever in the collective; when NO process calibrated, all
    raise the same error together."""
    from jax.experimental import multihost_utils

    from maxsquareloss_tpu.models.quantize import sync_amax_across_processes

    monkeypatch.setattr(jax, "process_count", lambda: 2)

    # sibling calibrated: the empty process adopts the synced amax
    def sibling_has_batches(vec):
        v = np.asarray(vec)
        other = np.concatenate([[1.0], np.full(len(v) - 1, 7.0, np.float32)])
        return np.stack([v, other])

    monkeypatch.setattr(multihost_utils, "process_allgather",
                        sibling_has_batches)
    cfg, mcfg, params, frozen = small_model()
    synced = sync_amax_across_processes({}, params)
    from maxsquareloss_tpu.models.quantize import iter_conv_sites
    assert set(synced) == {p for p, _ in iter_conv_sites(params)}
    assert all(v == 7.0 for v in synced.values())

    # nobody calibrated: a clean, collective-synchronized error
    monkeypatch.setattr(
        multihost_utils, "process_allgather",
        lambda vec: np.stack([np.asarray(vec), np.asarray(vec)]),
    )
    with pytest.raises(ValueError, match="no calibration batches"):
        sync_amax_across_processes({}, params)

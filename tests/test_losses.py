"""Loss-family parity vs torch-CPU oracles of the reference formulas.

The oracles implement the formulas documented in SURVEY.md C9-C12 (including
exact ``torch.histc(bins=C+1, min=-1, max=C-1)[1:]`` semantics for the IW
histogram) in NCHW torch, and we assert the jnp NHWC implementations match.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from maxsquareloss_tpu.ops.histogram import class_histogram, iw_class_weights
from maxsquareloss_tpu.ops.losses import (
    cross_entropy,
    entropy_loss,
    iw_entropy_loss,
    iw_max_square_loss,
    max_square_loss,
    self_produced_guidance,
    soft_cross_entropy,
)

C = 19


def _softmax_probs(rng, n=2, h=17, w=23, c=C, sharp=3.0):
    logits = rng.standard_normal((n, h, w, c), dtype=np.float32) * sharp
    return np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1)), logits


def _torch_iw_weights(label_nhw: np.ndarray, num_class=C, ratio=0.2):
    """Oracle: per-image histc-based class weights (SURVEY.md C10)."""
    ws = []
    for i in range(label_nhw.shape[0]):
        hist = torch.histc(
            torch.from_numpy(label_nhw[i]).float(),
            bins=num_class + 1,
            min=-1,
            max=num_class - 1,
        ).float()
        hist = hist[1:]
        w = 1.0 / torch.max(
            torch.pow(hist, ratio) * torch.pow(hist.sum(), 1.0 - ratio),
            torch.ones(1),
        )
        ws.append(w.numpy())
    return np.stack(ws)


def test_class_histogram_matches_histc(rng):
    labels = rng.integers(-1, C, size=(3, 17, 23)).astype(np.int32)
    got = np.asarray(class_histogram(jnp.asarray(labels), C))
    for i in range(labels.shape[0]):
        want = torch.histc(
            torch.from_numpy(labels[i]).float(), bins=C + 1, min=-1, max=C - 1
        ).numpy()[1:]
        np.testing.assert_array_equal(got[i], want)


def test_iw_weights_match_oracle(rng):
    labels = rng.integers(-1, C, size=(2, 17, 23)).astype(np.int32)
    hist = class_histogram(jnp.asarray(labels), C)
    got = np.asarray(iw_class_weights(hist, 0.2))
    want = _torch_iw_weights(labels)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_iw_weights_clamp_at_one(rng):
    # An image containing a single rare pixel of class 0: hist^0.2*total^0.8
    # can dip below 1 only for tiny totals; verify the max(.,1) clamp.
    labels = np.full((1, 1, 2), -1, dtype=np.int32)
    labels[0, 0, 0] = 0
    hist = class_histogram(jnp.asarray(labels), C)
    w = np.asarray(iw_class_weights(hist, 0.2))
    want = _torch_iw_weights(labels)
    np.testing.assert_allclose(w, want, rtol=1e-6)
    assert np.all(w <= 1.0 + 1e-6)


def test_cross_entropy_matches_torch(rng):
    n, h, w = 2, 9, 11
    logits = rng.standard_normal((n, h, w, C), dtype=np.float32)
    labels = rng.integers(-1, C, size=(n, h, w)).astype(np.int32)
    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    lt = torch.from_numpy(logits).permute(0, 3, 1, 2)
    want = torch.nn.functional.cross_entropy(
        lt, torch.from_numpy(labels).long(), ignore_index=-1
    ).item()
    assert got == pytest.approx(want, rel=1e-4)


def test_cross_entropy_all_ignored():
    logits = jnp.zeros((1, 2, 2, C))
    labels = jnp.full((1, 2, 2), -1, dtype=jnp.int32)
    assert float(cross_entropy(logits, labels)) == 0.0


def test_max_square_matches_formula(rng):
    prob, _ = _softmax_probs(rng)
    got = float(max_square_loss(jnp.asarray(prob)))
    want = -float(np.mean(prob**2)) / 2.0
    assert got == pytest.approx(want, rel=1e-4)


@pytest.mark.parametrize("with_label", [False, True])
def test_iw_max_square_matches_oracle(rng, with_label):
    prob, _ = _softmax_probs(rng)
    n, h, w, c = prob.shape
    label = (
        rng.integers(-1, C, size=(n, h, w)).astype(np.int32) if with_label else None
    )
    got = float(
        iw_max_square_loss(
            jnp.asarray(prob),
            None if label is None else jnp.asarray(label),
            num_classes=C,
        )
    )
    # torch oracle (SURVEY.md C10): weights from histc of label-or-argpred,
    # gathered by argpred, detached; loss = -sum(p^2 * w) / (N*C).
    pt = torch.from_numpy(np.array(prob))  # copy: prob may be a read-only view
    argpred = pt.argmax(dim=-1).numpy().astype(np.int32)
    count_label = argpred if label is None else label
    wmat = _torch_iw_weights(count_label)  # (N, C)
    pix_w = np.take_along_axis(
        wmat, argpred.reshape(n, -1), axis=1
    ).reshape(n, h, w)
    want = -float(np.sum((prob**2) * pix_w[..., None])) / (n * C)
    assert got == pytest.approx(want, rel=1e-4)


def test_entropy_loss(rng):
    prob, _ = _softmax_probs(rng)
    got = float(entropy_loss(jnp.asarray(prob)))
    ent = -np.sum(prob * np.log(prob + 1e-30), axis=-1)
    want = float(np.mean(ent)) / np.log(C)
    assert got == pytest.approx(want, rel=1e-4)


def test_iw_entropy_loss_weighting(rng):
    prob, _ = _softmax_probs(rng)
    n, h, w, c = prob.shape
    got = float(iw_entropy_loss(jnp.asarray(prob), num_classes=C))
    argpred = prob.argmax(axis=-1).astype(np.int32)
    wmat = _torch_iw_weights(argpred)
    pix_w = np.take_along_axis(wmat, argpred.reshape(n, -1), axis=1).reshape(n, h, w)
    ent = -np.sum(prob * np.log(prob + 1e-30), axis=-1)
    want = float(np.mean(ent * pix_w)) / np.log(C)
    assert got == pytest.approx(want, rel=1e-4)


def test_soft_cross_entropy(rng):
    n, h, w = 1, 5, 7
    logits = rng.standard_normal((n, h, w, C), dtype=np.float32)
    q = np.asarray(jax.nn.softmax(jnp.asarray(rng.standard_normal((n, h, w, C), dtype=np.float32))))
    got = float(soft_cross_entropy(jnp.asarray(logits), jnp.asarray(q)))
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    want = float(np.mean(-np.sum(q * logp, axis=-1)))
    assert got == pytest.approx(want, rel=1e-4)


def test_self_produced_guidance(rng):
    pm, _ = _softmax_probs(rng, sharp=6.0)
    pa, _ = _softmax_probs(rng, sharp=6.0)
    thr = 0.8
    lab = np.asarray(self_produced_guidance(jnp.asarray(pm), jnp.asarray(pa), thr))
    ens = (pm + pa) / 2.0
    want = np.where(ens.max(axis=-1) > thr, ens.argmax(axis=-1), -1)
    np.testing.assert_array_equal(lab, want)
    assert lab.min() >= -1 and lab.max() < C


def test_self_produced_guidance_per_head_or(rng):
    """per_head_or masks where EITHER head's own max prob passes; it is a
    strict superset of the ensemble mask (ADVICE r1: plausible upstream
    semantics, exposed as --guidance_mask)."""
    pm, _ = _softmax_probs(rng, sharp=6.0)
    pa, _ = _softmax_probs(rng, sharp=6.0)
    thr = 0.8
    lab = np.asarray(
        self_produced_guidance(
            jnp.asarray(pm), jnp.asarray(pa), thr, mask_mode="per_head_or"
        )
    )
    ens = (pm + pa) / 2.0
    mask = (pm.max(axis=-1) > thr) | (pa.max(axis=-1) > thr)
    want = np.where(mask, ens.argmax(axis=-1), -1)
    np.testing.assert_array_equal(lab, want)
    # superset property vs the ensemble mask
    lab_ens = np.asarray(
        self_produced_guidance(jnp.asarray(pm), jnp.asarray(pa), thr)
    )
    assert np.all((lab_ens == -1) | (lab == lab_ens))
    assert (lab != -1).sum() >= (lab_ens != -1).sum()


def test_losses_differentiable(rng):
    prob_logits = jnp.asarray(rng.standard_normal((1, 8, 8, C), dtype=np.float32))

    def loss_fn(logits, fn):
        p = jax.nn.softmax(logits, axis=-1)
        return fn(p)

    for fn in (
        max_square_loss,
        lambda p: iw_max_square_loss(p, num_classes=C),
        entropy_loss,
        lambda p: iw_entropy_loss(p, num_classes=C),
    ):
        g = jax.grad(loss_fn)(prob_logits, fn)
        assert bool(jnp.all(jnp.isfinite(g)))

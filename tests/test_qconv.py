"""int8 TRAINING conv (ops/qconv.int8_train_conv + clip_resnet.
Int8TrainConv — the TPU.INT8_TRAIN lever).

Pins: (a) the quantized forward matches the exact conv within
quantization tolerance; (b) the int8 dgrad matches the exact conv's
input gradient within tolerance, and the int8 wgrad formulation (the
"CHWN/IHWO/HWNC" dimension-number conv) matches the exact weight
gradient within tolerance; (c) with wgrad_int8=False the weight
gradient is EXACT (bit-equal to the plain conv's, straight-through);
(d) param-tree/checkpoint compatibility with nn.Conv; (e) the knob
trains end-to-end through a jitted SGD loop with a decreasing loss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coin_tpu.models.clip_resnet import Int8TrainConv, Res5Head, _conv
from coin_tpu.ops.qconv import int8_train_conv


def _rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


def _exact_conv(x, w, stride=1):
    k = w.shape[0]
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


@pytest.mark.parametrize("k", [1, 3])
def test_fwd_and_grads_close_to_exact(rng, k):
    x = jnp.asarray(rng.randn(2, 10, 10, 16).astype(np.float32))
    w = jnp.asarray((rng.randn(k, k, 16, 24) * 0.1).astype(np.float32))
    g = jnp.asarray(rng.randn(2, 10, 10, 24).astype(np.float32))

    y = int8_train_conv(x, w, 1, True)
    y_ref = _exact_conv(x, w)
    assert _rel_err(y, y_ref) < 0.05

    def f_q(x_, w_):
        return jnp.vdot(int8_train_conv(x_, w_, 1, True), g)

    def f_ref(x_, w_):
        return jnp.vdot(_exact_conv(x_, w_), g)

    dx_q, dw_q = jax.grad(f_q, argnums=(0, 1))(x, w)
    dx_r, dw_r = jax.grad(f_ref, argnums=(0, 1))(x, w)
    # two per-tensor int8 operands: a few % relative error
    assert _rel_err(dx_q, dx_r) < 0.06, _rel_err(dx_q, dx_r)
    assert _rel_err(dw_q, dw_r) < 0.06, _rel_err(dw_q, dw_r)


def test_exact_wgrad_is_bit_exact(rng):
    """wgrad_int8=False: the optimizer sees the plain conv's weight
    gradient (straight-through estimator) exactly."""
    x = jnp.asarray(rng.randn(2, 8, 8, 8).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, 8, 12) * 0.1).astype(np.float32))
    g = jnp.asarray(rng.randn(2, 8, 8, 12).astype(np.float32))

    dw_q = jax.grad(
        lambda w_: jnp.vdot(int8_train_conv(x, w_, 1, False), g))(w)
    dw_r = jax.grad(lambda w_: jnp.vdot(_exact_conv(x, w_), g))(w)
    np.testing.assert_array_equal(np.asarray(dw_q), np.asarray(dw_r))


def test_bf16_dtypes_round_trip(rng):
    """Production dtypes: bf16 activations, f32 master weights —
    tangents must come back in the primal dtypes."""
    x = jnp.asarray(rng.randn(1, 6, 6, 8).astype(np.float32)).astype(
        jnp.bfloat16)
    w = jnp.asarray((rng.randn(3, 3, 8, 8) * 0.1).astype(np.float32))
    g = jnp.ones((1, 6, 6, 8), jnp.float32)
    dx, dw = jax.grad(
        lambda x_, w_: jnp.vdot(int8_train_conv(x_, w_, 1, True), g),
        argnums=(0, 1))(x, w)
    assert dx.dtype == jnp.bfloat16
    assert dw.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(dw)))


def test_module_checkpoint_compatible(rng):
    x = jnp.asarray(rng.randn(2, 12, 12, 32).astype(np.float32))
    exact = _conv(24, 3)
    qt = Int8TrainConv(24, 3)
    params = exact.init(jax.random.key(0), x)
    qparams = qt.init(jax.random.key(0), x)
    assert jax.tree.structure(params) == jax.tree.structure(qparams)
    assert [p.shape for p in jax.tree.leaves(params)] == \
        [p.shape for p in jax.tree.leaves(qparams)]
    assert _rel_err(qt.apply(params, x), exact.apply(params, x)) < 0.05


def test_qt_mode2_wgrad_exact(rng):
    """qt=2 (TPU.INT8_TRAIN_WGRAD: false): the module's weight
    gradient is bit-equal to the plain conv's while the forward stays
    int8-quantized."""
    x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    g = jnp.asarray(rng.randn(2, 8, 8, 8).astype(np.float32))
    exact = _conv(8, 3)
    qt2 = _conv(8, 3, qt=2)
    params = exact.init(jax.random.key(1), x)

    y = qt2.apply(params, x)
    assert _rel_err(y, exact.apply(params, x)) < 0.05
    assert not np.array_equal(np.asarray(y),
                              np.asarray(exact.apply(params, x)))

    dw_q = jax.grad(lambda p: jnp.vdot(qt2.apply(p, x), g))(params)
    dw_r = jax.grad(lambda p: jnp.vdot(exact.apply(p, x), g))(params)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(dw_q)[0]),
        np.asarray(jax.tree.leaves(dw_r)[0]))


@pytest.mark.parametrize("wgrad_int8", [True, False])
def test_bf16_compute_grads(rng, wgrad_int8):
    """Regression (round 4): at bf16 compute — the PRODUCTION dtype —
    both int8-train modes must trace and execute. The wgrad-exact mode
    once built a mixed bf16×f32 transpose conv (the exact-grad helpers
    cast the cotangent to float32), which fails to lower; the exact
    grads now run wholly in the operands' dtype, like the plain bf16
    conv's own backward."""
    x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32),
                    jnp.bfloat16)
    w = jnp.asarray((rng.randn(3, 3, 16, 8) * 0.1).astype(np.float32))

    def loss(w_, x_):
        return jnp.sum(int8_train_conv(x_, w_, 1, wgrad_int8) ** 2)

    dw, dx = jax.jit(jax.grad(loss, argnums=(0, 1)),
                     static_argnames=())(w, x)
    assert dw.dtype == w.dtype and dx.dtype == x.dtype
    assert np.isfinite(np.asarray(dw, np.float32)).all()
    assert np.isfinite(np.asarray(dx, np.float32)).all()
    # and the bf16 grads approximate the f32 exact conv's
    x32, w32 = x.astype(jnp.float32), w
    dw_r, dx_r = jax.grad(
        lambda w_, x_: jnp.sum(_exact_conv(x_, w_) ** 2),
        argnums=(0, 1))(w32, x32)
    assert _rel_err(np.asarray(dw, np.float32), dw_r) < 0.08
    assert _rel_err(np.asarray(dx, np.float32), dx_r) < 0.08


def test_per_sample_equals_per_tensor_of_each_sample(rng):
    """per_sample=True on a batch is bit-equal to running the
    per-tensor path on each sample alone — the per-sample scale IS
    that sample's per-tensor scale, pinning the exact factorization
    (batch is a non-contracted dim of the forward conv)."""
    x = np.stack([rng.randn(9, 9, 16) * 0.01,
                  rng.randn(9, 9, 16),
                  rng.randn(9, 9, 16) * 40.0]).astype(np.float32)
    x = jnp.asarray(x)
    w = jnp.asarray((rng.randn(3, 3, 16, 8) * 0.1).astype(np.float32))
    y_ps = int8_train_conv(x, w, 1, False, True)
    for n in range(3):
        y_n = int8_train_conv(x[n:n + 1], w, 1, False, False)
        np.testing.assert_array_equal(np.asarray(y_ps[n:n + 1]),
                                      np.asarray(y_n))


def test_per_sample_fixes_outlier_crop(rng):
    """The int8train_wx A/B's failure mode: one outlier ROI crop sets
    the per-tensor quantization step for the whole batch, destroying
    the small crops' forward; per-sample scales keep every crop at
    full int8 resolution. Same effect on the dgrad, where background
    crops carry near-zero gradients."""
    small = rng.randn(7, 9, 9, 16).astype(np.float32)
    outlier = (rng.randn(1, 9, 9, 16) * 300.0).astype(np.float32)
    x = jnp.asarray(np.concatenate([small, outlier]))
    w = jnp.asarray((rng.randn(3, 3, 16, 8) * 0.1).astype(np.float32))

    y_ref = _exact_conv(x, w)
    y_pt = int8_train_conv(x, w, 1, False, False)
    y_ps = int8_train_conv(x, w, 1, False, True)
    err_pt = _rel_err(y_pt[:7], y_ref[:7])
    err_ps = _rel_err(y_ps[:7], y_ref[:7])
    assert err_ps < 0.05, err_ps
    assert err_pt > 5 * err_ps, (err_pt, err_ps)

    # dgrad: one crop with huge gradients (e.g. a hard positive) must
    # not zero out the others' input gradients
    g_small = rng.randn(7, 9, 9, 8).astype(np.float32)
    g_big = (rng.randn(1, 9, 9, 8) * 300.0).astype(np.float32)
    g = jnp.asarray(np.concatenate([g_small, g_big]))
    x_plain = jnp.asarray(rng.randn(8, 9, 9, 16).astype(np.float32))

    def dx_of(per_sample):
        return jax.grad(lambda x_: jnp.vdot(
            int8_train_conv(x_, w, 1, False, per_sample), g))(x_plain)

    dx_ref = jax.grad(
        lambda x_: jnp.vdot(_exact_conv(x_, w), g))(x_plain)
    err_pt = _rel_err(np.asarray(dx_of(False))[:7], dx_ref[:7])
    err_ps = _rel_err(np.asarray(dx_of(True))[:7], dx_ref[:7])
    assert err_ps < 0.06, err_ps
    assert err_pt > 5 * err_ps, (err_pt, err_ps)


def test_per_sample_implies_exact_wgrad(rng):
    """per-sample scales cannot factor out of the wgrad contraction
    (batch IS contracted there), so per_sample forces the exact wgrad
    even when wgrad_int8=True is passed."""
    x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, 16, 8) * 0.1).astype(np.float32))
    g = jnp.asarray(rng.randn(2, 8, 8, 8).astype(np.float32))
    dw_q = jax.grad(
        lambda w_: jnp.vdot(int8_train_conv(x, w_, 1, True, True), g))(w)
    dw_r = jax.grad(lambda w_: jnp.vdot(_exact_conv(x, w_), g))(w)
    np.testing.assert_array_equal(np.asarray(dw_q), np.asarray(dw_r))


def test_qt_mode3_module_and_bf16(rng):
    """qt=3 (TPU.INT8_TRAIN_SCALE: sample): module forward close to
    exact, checkpoint-compatible params, and the production bf16
    compute path traces and executes jitted."""
    x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    exact = _conv(8, 3)
    qt3 = _conv(8, 3, qt=3)
    params = exact.init(jax.random.key(2), x)
    assert jax.tree.structure(params) == \
        jax.tree.structure(qt3.init(jax.random.key(2), x))
    assert _rel_err(qt3.apply(params, x), exact.apply(params, x)) < 0.05

    xb = x.astype(jnp.bfloat16)
    dw = jax.jit(jax.grad(
        lambda p: jnp.sum(qt3.apply(p, xb).astype(jnp.float32) ** 2)
    ))(params)
    leaf = np.asarray(jax.tree.leaves(dw)[0], np.float32)
    assert np.isfinite(leaf).all()


def test_res5_qt_trains(rng):
    """End-to-end: a jitted SGD loop through the int8-train res5 head
    reduces a regression loss (grads are real, scales stay finite)."""
    head = Res5Head(depth=50, qt=True)
    x = jnp.asarray(rng.randn(4, 8, 8, 1024).astype(np.float32))
    params = head.init(jax.random.key(0), x)
    target = jnp.zeros((4, 4, 4, 2048), jnp.float32)

    @jax.jit
    def step(p):
        def loss_fn(p_):
            out = head.apply(p_, x).astype(jnp.float32)
            return jnp.mean((out - target) ** 2)
        l, gr = jax.value_and_grad(loss_fn)(p)
        return jax.tree.map(lambda a, b: a - 1e-3 * b, p, gr), l

    losses = []
    for _ in range(8):
        params, l = step(params)
        losses.append(float(l))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_qt_mode4_fwd_only_exact_grads(rng):
    """qt=4 (TPU.INT8_TRAIN_DGRAD: false): quantized per-sample
    FORWARD, but BOTH gradients bit-equal to the plain conv's
    (straight-through: the backward treats y = conv(x, w) as exact, and
    with dgrad_int8=False the exact transpose convs run unquantized)."""
    x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, 16, 8) * 0.1).astype(np.float32))
    g = jnp.asarray(rng.randn(2, 8, 8, 8).astype(np.float32))

    y = int8_train_conv(x, w, 1, False, True, False)
    assert _rel_err(y, _exact_conv(x, w)) < 0.05

    def f_q(x_, w_):
        return jnp.vdot(int8_train_conv(x_, w_, 1, False, True, False), g)

    def f_ref(x_, w_):
        return jnp.vdot(_exact_conv(x_, w_), g)

    dx_q, dw_q = jax.grad(f_q, argnums=(0, 1))(x, w)
    dx_r, dw_r = jax.grad(f_ref, argnums=(0, 1))(x, w)
    np.testing.assert_array_equal(np.asarray(dx_q), np.asarray(dx_r))
    np.testing.assert_array_equal(np.asarray(dw_q), np.asarray(dw_r))

    # module plumbing: qt=4 module is checkpoint-compatible and jits
    exact = _conv(8, 3)
    qt4 = _conv(8, 3, qt=4)
    params = exact.init(jax.random.key(2), x)
    assert jax.tree.structure(params) == \
        jax.tree.structure(qt4.init(jax.random.key(2), x))
    out = jax.jit(qt4.apply)(params, x.astype(jnp.bfloat16))
    assert np.isfinite(np.asarray(out, np.float32)).all()

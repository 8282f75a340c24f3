"""scan=True ResStage equals the unrolled stage bit-for-bit math-wise:
stack the unrolled per-block params into the scan layout and compare
outputs (the program-size lever must not change numerics)."""

import numpy as np
import jax
import jax.numpy as jnp

from coin_tpu.models.clip_resnet import (CLIPResNetBackbone, ResStage,
                                         Res5Head, stack_stage_params)


def test_resstage_scan_equivalence():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 16, 256).astype(np.float32))
    unrolled = ResStage(planes=64, blocks=4)
    p = unrolled.init(jax.random.key(1), x)["params"]
    ref = unrolled.apply({"params": p}, x)

    scanned = ResStage(planes=64, blocks=4, scan=True)
    ps = stack_stage_params(p, 4)
    # sanity: scan layout matches what init would build
    want = jax.tree.map(lambda a: a.shape,
                        scanned.init(jax.random.key(2), x)["params"])
    got = jax.tree.map(lambda a: a.shape, ps)
    assert want == got
    out = scanned.apply({"params": ps}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_backbone_scan_equivalence():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    plain = CLIPResNetBackbone(depth=50)
    p = plain.init(jax.random.key(0), x)["params"]
    ref = plain.apply({"params": p}, x)

    layers = (3, 4, 6)
    ps = dict(p)
    for name, blocks in zip(("layer1", "layer2", "layer3"), layers):
        ps[name] = stack_stage_params(p[name], blocks)
    out = CLIPResNetBackbone(depth=50, scan=True).apply({"params": ps}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_res5_scan_equivalence():
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(4, 14, 14, 1024).astype(np.float32))
    plain = Res5Head(depth=50)
    p = plain.init(jax.random.key(0), x)["params"]
    ref = plain.apply({"params": p}, x)
    ps = {"layer4": stack_stage_params(p["layer4"], 3)}
    out = Res5Head(depth=50, scan=True).apply({"params": ps}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

import numpy as np
import jax.numpy as jnp

from coin_tpu import structures as S
from coin_tpu.structures import Detections


def make(cap=6, n=3):
    return Detections.from_numpy(
        np.arange(n * 4, dtype=np.float32).reshape(n, 4) + 1.0,
        np.linspace(0.9, 0.5, n).astype(np.float32),
        np.arange(n), cap,
        probs=np.tile(np.asarray([[0.7, 0.2, 0.1]], np.float32), (n, 1)))


def test_from_numpy_padding():
    d = make()
    assert d.capacity == 6
    assert int(d.count()) == 3
    assert (np.asarray(d.classes)[3:] == -1).all()


def test_compact_moves_valid_front():
    d = make()
    d = d.mask(jnp.asarray([False, True, False, False, False, False]))
    c = S.compact(d)
    assert bool(c.valid[0]) and not bool(c.valid[1])
    np.testing.assert_allclose(np.asarray(c.boxes[0]),
                               np.asarray(d.boxes[1]))


def test_truncate_keeps_valid():
    d = make(cap=8, n=5)
    d = d.mask(jnp.asarray([True, False, True, False, True, False, False,
                            False]))
    t = S.truncate(d, 3)
    assert t.capacity == 3
    assert int(t.count()) == 3
    np.testing.assert_allclose(np.asarray(t.boxes[1]),
                               np.asarray(d.boxes[2]))


def test_concat_and_batched_ops():
    a, b = make(), make()
    cat = S.concatenate(a, b)
    assert cat.capacity == 12
    assert int(cat.count()) == 6

    batched = Detections(
        boxes=jnp.stack([a.boxes, b.boxes]),
        scores=jnp.stack([a.scores, b.scores]),
        classes=jnp.stack([a.classes, b.classes]),
        valid=jnp.stack([a.valid, b.valid]),
        probs=jnp.stack([a.probs, b.probs]))
    flipped = batched.hflip(jnp.asarray(100.0))
    np.testing.assert_allclose(
        np.asarray(flipped.boxes[0, 0]),
        [100 - float(a.boxes[0, 2]), float(a.boxes[0, 1]),
         100 - float(a.boxes[0, 0]), float(a.boxes[0, 3])])
    scaled = batched.scale(jnp.asarray(2.0), jnp.asarray(0.5))
    np.testing.assert_allclose(np.asarray(scaled.boxes[0, 0]),
                               np.asarray(a.boxes[0]) * [0.5, 2, 0.5, 2])
    clipped = batched.clip(jnp.asarray(5.0), jnp.asarray(6.0))
    assert float(jnp.max(clipped.boxes[..., 2])) <= 6.0

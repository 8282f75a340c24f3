"""jit_train_step donation modes: the `hot` split-state wrapper must be
numerically identical to plain jit and must not route `frozen` through
the jit boundary's outputs (it is re-attached host-side).

Hot mode exists because the axon-relay backend rejects full-TrainState
donation of the real dual-teacher step (INVALID_ARGUMENT) but accepts
donation of the three heavy trees (params/opt_state/teacher_params) —
the round-5 bisect, see BENCH.md. On CPU the wrapper runs without
donate_argnums, so this test exercises exactly the split/re-attach
plumbing the chip path uses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from coin_tpu.engine.state import Prototypes, TrainState, jit_train_step


def _mk_state():
    params = {"w": jnp.arange(12.0).reshape(3, 4) / 7.0,
              "b": jnp.ones((4,))}
    frozen = {"f": jnp.full((2, 2), 3.0)}
    tx = optax.sgd(1e-2, momentum=0.9)
    proto = jnp.linspace(0, 1, 8).reshape(2, 4)
    return TrainState(
        params=params, frozen=frozen, opt_state=tx.init(params),
        step=jnp.asarray(0), rng=jax.random.key(5),
        prototypes=Prototypes(proto, proto + 1, proto + 2),
        teacher_params=jax.tree.map(jnp.copy, params),
        merge_params={"m": jnp.ones((3,))},
        merge_opt_state={"mm": jnp.zeros((3,))}), tx


def _step_fn(tx):
    def fn(state, x):
        rng, sub = jax.random.split(state.rng)
        teacher = jax.tree.map(lambda t, s: t * 0.9 + s * 0.1,
                               state.teacher_params, state.params)

        def loss(p):
            return jnp.sum((x @ p["w"] + p["b"]
                            - state.frozen["f"].sum()) ** 2)

        g = jax.grad(loss)(state.params)
        upd, opt_state = tx.update(g, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, upd)
        protos = Prototypes(state.prototypes.proto * 0.5,
                            state.prototypes.b_online,
                            state.prototypes.b_offline)
        mp = jax.tree.map(lambda m: m + 1.0, state.merge_params)
        return state.replace(params=new_params, teacher_params=teacher,
                             opt_state=opt_state, prototypes=protos,
                             merge_params=mp, rng=rng,
                             step=state.step + 1), loss(new_params)
    return fn


@pytest.mark.parametrize("mode", ["0", "hot"])
def test_hot_matches_plain(monkeypatch, mode):
    monkeypatch.setenv("COIN_TPU_DONATE", mode)
    state, tx = _mk_state()
    x = jnp.asarray(np.random.RandomState(0).randn(5, 3),
                    jnp.float32)
    stepped = jit_train_step(_step_fn(tx))
    s, loss = stepped(state, x)
    s, loss = stepped(s, x)

    # reference: two plain eager applications
    ref, _ = _step_fn(tx)(state, x)
    ref, ref_loss = _step_fn(tx)(ref, x)

    assert np.allclose(float(loss), float(ref_loss), rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-6),
        (s.params, s.teacher_params, s.prototypes.proto,
         s.merge_params, s.step),
        (ref.params, ref.teacher_params, ref.prototypes.proto,
         ref.merge_params, ref.step))


def test_hot_preserves_frozen_identity(monkeypatch):
    monkeypatch.setenv("COIN_TPU_DONATE", "hot")
    state, tx = _mk_state()
    x = jnp.zeros((5, 3), jnp.float32)
    stepped = jit_train_step(_step_fn(tx))
    s, _ = stepped(state, x)
    # frozen is re-attached host-side: the SAME array object, no copy
    assert s.frozen["f"] is state.frozen["f"]
    assert int(s.step) == 1

"""ms_deform_sample vs the torch grid_sample formulation (the pure-torch
fallback semantics of multi-scale deformable attention)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from coin_tpu.models.deformable import ms_deform_sample


def torch_ms_deform(values, shapes, locations, weights):
    """values (B, ΣHW, H, D); locations (B, Q, H, L, P, 2) in [0,1];
    weights (B, Q, H, L, P). grid_sample bilinear, align_corners=False,
    zero padding."""
    b, _, heads, d = values.shape
    q = locations.shape[1]
    out = torch.zeros(b, q, heads, d)
    start = 0
    for lvl, (h, w) in enumerate(shapes):
        v = values[:, start:start + h * w]          # (B, HW, H, D)
        v = v.permute(0, 2, 3, 1).reshape(b * heads, d, h, w)
        loc = locations[:, :, :, lvl]               # (B, Q, H, P, 2)
        grid = 2.0 * loc - 1.0
        grid = grid.permute(0, 2, 1, 3, 4).reshape(b * heads, q, -1, 2)
        sampled = F.grid_sample(v, grid, mode="bilinear",
                                padding_mode="zeros",
                                align_corners=False)  # (BH, D, Q, P)
        wgt = weights[:, :, :, lvl].permute(0, 2, 1, 3)
        wgt = wgt.reshape(b * heads, 1, q, -1)
        out += (sampled * wgt).sum(-1).reshape(b, heads, d, q) \
            .permute(0, 3, 1, 2)
        start += h * w
    return out


def test_ms_deform_matches_grid_sample(rng):
    b, heads, d, q, P = 2, 2, 4, 5, 3
    shapes = [(6, 8), (3, 4)]
    starts = [0, 48]
    total = 48 + 12
    values = rng.randn(b, total, heads, d).astype(np.float32)
    locs = rng.uniform(0.05, 0.95,
                       (b, q, heads, 2, P, 2)).astype(np.float32)
    w = rng.dirichlet(np.ones(2 * P), (b, q, heads)).astype(np.float32)
    w = w.reshape(b, q, heads, 2, P)

    got = np.asarray(ms_deform_sample(
        jnp.asarray(values), shapes, starts, jnp.asarray(locs),
        jnp.asarray(w)))
    ref = torch_ms_deform(torch.tensor(values), shapes,
                          torch.tensor(locs), torch.tensor(w)).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_ms_deform_out_of_range_zero_padded(rng):
    b, heads, d, q, P = 1, 1, 2, 1, 1
    shapes = [(4, 4)]
    values = rng.randn(b, 16, heads, d).astype(np.float32)
    # location far outside → zero contribution
    locs = np.full((b, q, heads, 1, P, 2), 3.0, np.float32)
    w = np.ones((b, q, heads, 1, P), np.float32)
    got = np.asarray(ms_deform_sample(
        jnp.asarray(values), shapes, [0], jnp.asarray(locs),
        jnp.asarray(w)))
    np.testing.assert_allclose(got, 0.0, atol=1e-6)


def test_mha_converter_parity(rng):
    """models.gdino.MHA + convert_gdino._mha vs torch MultiheadAttention."""
    import torch.nn as tnn
    import jax
    from coin_tpu.models.gdino import MHA
    from coin_tpu.models.convert_gdino import _mha

    dim, heads, q, kv = 32, 4, 5, 7
    torch.manual_seed(4)
    tm = tnn.MultiheadAttention(dim, heads, batch_first=True).eval()
    xq = rng.randn(2, q, dim).astype(np.float32)
    xk = rng.randn(2, kv, dim).astype(np.float32)
    with torch.no_grad():
        ref, _ = tm(torch.tensor(xq), torch.tensor(xk), torch.tensor(xk),
                    need_weights=False)
    sd = {f"attn.{k}": v.numpy() for k, v in tm.state_dict().items()}
    params = _mha(sd, "attn", dim)
    model = MHA(dim, heads)
    got = model.apply({"params": params}, jnp.asarray(xq),
                      jnp.asarray(xk), jnp.asarray(xk))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=2e-4,
                               atol=2e-4)

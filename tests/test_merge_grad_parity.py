"""Parity of the CKG merge-training losses — especially the
gradient-direction alignment (second-order) term — against a torch
double-backward replica of the reference computation
(coin/utils/losses.py:75-96 + fast_rcnn.py:519-533 + trainer.py:192-197).
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp
from flax import traverse_util

from coin_tpu.engine import coin_pipelines
from coin_tpu.engine.state import Prototypes
from coin_tpu.models import roi_heads as rh
from coin_tpu.models.ckg import CKGNet


D = 64          # pooled feature dim (res5 out in the real model)
TEXT = 32       # text/merge dim
C = 3           # foreground classes
S = 12          # sampled rows


class TorchRig(tnn.Module):
    """trans MLP + cls head + cosine classify + CKG net (reference
    formulas)."""

    def __init__(self):
        super().__init__()
        self.trans = tnn.Sequential(
            tnn.Linear(D, D // 2), tnn.LeakyReLU(),
            tnn.Linear(D // 2, D // 2), tnn.LeakyReLU(),
            tnn.Linear(D // 2, D))
        self.cls_score = tnn.Linear(D, TEXT)
        # CKG
        def ca():
            m = tnn.Module()
            m.q = tnn.Linear(TEXT, TEXT, bias=False)
            m.k = tnn.Linear(TEXT, TEXT, bias=False)
            m.v = tnn.Linear(TEXT, TEXT, bias=False)
            m.out = tnn.Linear(TEXT, C + 1)
            return m
        self.cross_off = ca()
        self.cross_on = ca()

    def classify(self, pooled, text):
        x = self.trans(pooled)
        feats = self.cls_score(x)
        img = feats / feats.norm(dim=1, keepdim=True)
        txt = text / text.norm(dim=1, keepdim=True)
        return (img @ txt.t()) / 0.01

    def ckg(self, x, proto_off, proto_on, p_off, p_on, heads=2):
        def cross(m, kv):
            hd = TEXT // heads
            q = m.q(x).view(-1, heads, hd).transpose(0, 1)
            k = m.k(kv).view(-1, heads, hd).transpose(0, 1)
            v = m.v(kv).view(-1, heads, hd).transpose(0, 1)
            a = torch.softmax(q @ k.transpose(-1, -2) / np.sqrt(hd), -1)
            o = (a @ v).transpose(0, 1).reshape(-1, TEXT)
            return m.out(o)
        w_off = cross(self.cross_off, proto_off)
        w_on = cross(self.cross_on, proto_on)
        return torch.softmax(w_off * p_off + w_on * p_on, dim=1)


def torch_reference(rig, pooled, text, feats_ckg, p_off, p_on, proto_off,
                    proto_on, a_rows, b_rows, one_hot_a):
    scores = rig.classify(pooled, text)
    probs = torch.softmax(scores, dim=1)
    merge = rig.ckg(feats_ckg, proto_off, proto_on, p_off, p_on)
    kl = tnn.KLDivLoss(reduction="mean")
    loss_base = kl(torch.log(merge[a_rows] + 1e-7), one_hot_a[a_rows])
    loss_a = 1e4 * F.mse_loss(probs[a_rows], one_hot_a[a_rows])
    loss_b = 1e4 * F.mse_loss(probs[b_rows], merge[b_rows])

    sims = []
    for p in rig.trans.parameters():
        ga = torch.autograd.grad([loss_a], [p], create_graph=True,
                                 only_inputs=True)[0]
        gb = torch.autograd.grad([loss_b], [p], create_graph=True,
                                 only_inputs=True)[0]
        if p.dim() > 1:
            sims.append(F.cosine_similarity(ga.detach(), gb,
                                            dim=1).mean())
        else:
            sims.append(F.cosine_similarity(ga.detach(), gb, dim=0))
    loss_grad = (1.0 - torch.stack(sims)).mean()

    total = loss_grad + loss_base
    merge_params = (list(rig.cross_off.parameters())
                    + list(rig.cross_on.parameters()))
    grads = torch.autograd.grad(total, merge_params, allow_unused=True)
    return (loss_base.item(), loss_grad.item(),
            [None if g is None else g.detach().numpy() for g in grads])


def _lin(m):
    out = {"kernel": m.weight.detach().numpy().T}
    if m.bias is not None:
        out["bias"] = m.bias.detach().numpy()
    return out


def test_merge_losses_match_torch_double_backward(rng):
    torch.manual_seed(7)
    rig = TorchRig().double().float()

    pooled = rng.randn(S, D).astype(np.float32)
    text = rng.randn(C + 1, TEXT).astype(np.float32)
    feats_ckg = rng.randn(S, TEXT).astype(np.float32)
    p_off = rng.dirichlet(np.ones(C + 1), S).astype(np.float32)
    p_on = rng.dirichlet(np.ones(C + 1), S).astype(np.float32)
    proto_off = rng.randn(C + 1, TEXT).astype(np.float32)
    proto_on = rng.randn(C + 1, TEXT).astype(np.float32)
    group = np.asarray([rh.GROUP_A] * 5 + [rh.GROUP_B] * 4
                       + [rh.GROUP_BG] * 2 + [rh.GROUP_PAD], np.int8)
    cls_off = rng.randint(0, C, S).astype(np.int32)
    cls_off[group == rh.GROUP_BG] = C
    a_rows = torch.tensor(group == rh.GROUP_A)
    b_rows = torch.tensor(group == rh.GROUP_B)
    one_hot_full = np.eye(C + 1, dtype=np.float32)[np.clip(cls_off, 0, C)]

    ref_base, ref_grad, ref_merge_grads = torch_reference(
        rig, torch.tensor(pooled), torch.tensor(text),
        torch.tensor(feats_ckg), torch.tensor(p_off),
        torch.tensor(p_on), torch.tensor(proto_off),
        torch.tensor(proto_on), a_rows, b_rows,
        torch.tensor(one_hot_full))

    # ---- the coin_tpu side ----
    class ModelShim:
        """Exposes the detector's ``predict`` interface over a bare
        BoxPredictor (the full detector pins text_dim to the CLIP
        geometry)."""

        bp = rh.BoxPredictor(text_dim=TEXT)

        def apply(self, variables, pooled, text, method=None):
            params = variables["params"]["box_predictor"]
            class_feats, deltas = self.bp.apply({"params": params},
                                                pooled)
            scores = self.bp.classify(class_feats, text)
            return scores, deltas, class_feats

    model = ModelShim()
    # build a variables tree containing just what `predict` touches:
    # box_predictor weights mapped from the torch rig
    bp = {
        "trans_0": _lin(rig.trans[0]),
        "trans_1": _lin(rig.trans[2]),
        "trans_2": _lin(rig.trans[4]),
        "cls_score": _lin(rig.cls_score),
        # bbox_pred unused by these losses but required by predict()
        "bbox_pred": {"kernel": np.zeros((D, 4), np.float32),
                      "bias": np.zeros((4,), np.float32)},
    }
    variables = {"params": {"box_predictor": jax.tree.map(
        jnp.asarray, bp)}}

    # NOTE: the real model's text_dim differs; BoxPredictor is shape-
    # agnostic so predict() works with these smaller matrices.
    merge_model = CKGNet(hidden_size=TEXT, num_classes=C + 1, head_num=2)
    merge_params = {
        "cross_offline": {
            "linear_q": _lin(rig.cross_off.q),
            "linear_k": _lin(rig.cross_off.k),
            "linear_v": _lin(rig.cross_off.v),
            "linear_output": _lin(rig.cross_off.out)},
        "cross_online": {
            "linear_q": _lin(rig.cross_on.q),
            "linear_k": _lin(rig.cross_on.k),
            "linear_v": _lin(rig.cross_on.v),
            "linear_output": _lin(rig.cross_on.out)},
    }
    merge_params = jax.tree.map(jnp.asarray, merge_params)

    scores_j, _, _ = model.apply(variables, jnp.asarray(pooled),
                                 jnp.asarray(text), method="predict")
    sp = rh.SampledProposals(
        boxes=jnp.zeros((S, 4)), group=jnp.asarray(group),
        gt_boxes=jnp.zeros((S, 4)), cls_offline=jnp.asarray(cls_off),
        cls_online=jnp.asarray(cls_off),
        probs_offline=jnp.asarray(p_off), probs_online=jnp.asarray(p_on))
    fw = coin_pipelines.StudentForward(
        losses={}, sp=sp, scores=scores_j,
        class_feats=jnp.asarray(feats_ckg), pooled=jnp.asarray(pooled),
        c_scores=jnp.zeros((1, C + 1)), c_probs=jnp.zeros((1, C + 1)),
        c_valid=jnp.zeros((1,), bool))
    protos = Prototypes(jnp.asarray(proto_off), jnp.asarray(proto_on),
                        jnp.asarray(proto_off))

    def merge_loss_fn(mp):
        ml = coin_pipelines.merge_losses(
            merge_model, mp, variables, model, fw, protos, C,
            jnp.asarray(text))
        return ml["loss_merge_grad"] + ml["loss_merge_base"], ml

    (total, ml), mgrads = jax.value_and_grad(
        merge_loss_fn, has_aux=True)(merge_params)

    np.testing.assert_allclose(float(ml["loss_merge_base"]), ref_base,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(ml["loss_merge_grad"]), ref_grad,
                               rtol=2e-3, atol=1e-4)

    # merge-net gradient parity (order: off q,k,v,out then on q,k,v,out)
    flat = traverse_util.flatten_dict(mgrads)
    key_order = [
        ("cross_offline", "linear_q", "kernel"),
        ("cross_offline", "linear_k", "kernel"),
        ("cross_offline", "linear_v", "kernel"),
        ("cross_offline", "linear_output", "kernel"),
        ("cross_offline", "linear_output", "bias"),
        ("cross_online", "linear_q", "kernel"),
        ("cross_online", "linear_k", "kernel"),
        ("cross_online", "linear_v", "kernel"),
        ("cross_online", "linear_output", "kernel"),
        ("cross_online", "linear_output", "bias"),
    ]
    ref_iter = iter(ref_merge_grads)
    ref_map = {}
    for side in ("cross_offline", "cross_online"):
        for nm in ("linear_q", "linear_k", "linear_v"):
            ref_map[(side, nm, "kernel")] = next(ref_iter).T
        ref_map[(side, "linear_output", "kernel")] = next(ref_iter).T
        ref_map[(side, "linear_output", "bias")] = next(ref_iter)
    for key in key_order:
        got = np.asarray(flat[key])
        np.testing.assert_allclose(got, ref_map[key], rtol=5e-3,
                                   atol=2e-4, err_msg=str(key))

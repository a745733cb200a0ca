"""Golden parity: our jnp losses vs the ACTUAL mounted PyTorch reference
(`/root/reference/commons/losses.py`), executed on CPU with a stubbed `dgl`
module (losses.py only imports dgl for a type annotation).

SURVEY.md §4 item 2: per-function allclose against the reference.
"""
import sys
import types

import numpy as np
import pytest

# --- import the reference loss module without dgl installed ----------------
if "dgl" not in sys.modules:
    dgl_stub = types.ModuleType("dgl")
    dgl_stub.DGLGraph = object
    sys.modules["dgl"] = dgl_stub
sys.path.insert(0, "/root/reference")
import torch  # noqa: E402

torch.manual_seed(0)
from commons import losses as ref  # noqa: E402

sys.path.pop(0)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from infomax3d_tpu.losses import LOSS_REGISTRY  # noqa: E402

B, D, C = 12, 8, 3
RNG = np.random.default_rng(42)
Z1 = RNG.normal(size=(B, D)).astype(np.float32)
Z2 = RNG.normal(size=(B, D)).astype(np.float32)
Z2C = RNG.normal(size=(B * C, D)).astype(np.float32)
Z1C = RNG.normal(size=(B, C * D)).astype(np.float32)
Z1P = RNG.normal(scale=0.5, size=(B, 2 * D)).astype(np.float32)   # (mean, logvar)
Z2X = RNG.normal(size=(B * (1 + 2), D)).astype(np.float32)        # extra negatives


def t(x):
    return torch.from_numpy(x)


def j(x):
    return jnp.asarray(x)


def check(name, ref_val, args, kwargs=None, params=None, tol=2e-4):
    ours = LOSS_REGISTRY[name](**(params or {}))
    got = ours(*[j(a) for a in args], **{k: j(v) for k, v in (kwargs or {}).items()})
    np.testing.assert_allclose(np.asarray(got), float(ref_val), rtol=tol, atol=tol,
                               err_msg=name)


REG = dict(uniformity_reg=0.3, variance_reg=0.2, covariance_reg=0.1)


@pytest.mark.parametrize("name,params,args", [
    ("NTXent", dict(tau=0.1), (Z1, Z2)),
    ("NTXent", dict(tau=0.5, norm=False), (Z1, Z2)),
    ("NTXent", dict(tau=0.3, **REG), (Z1, Z2)),
    ("InfoNCE", dict(tau=0.2), (Z1, Z2)),
    ("InfoNCEHard", dict(tau=0.5, tau_plus=0.1, beta=0.5), (Z1, Z2)),
    ("NTXentHard", dict(tau=0.5, tau_plus=0.05, beta=0.1), (Z1, Z2)),
    ("BarlowTwinsLoss", dict(), (Z1, Z2)),
    ("BarlowTwinsLoss", REG, (Z1, Z2)),
    ("CosineSimilarityLoss", dict(), (Z1, Z2)),
    ("RegularizationLoss", dict(), (Z1, Z2)),
    ("NTXentMultiplePositives", dict(tau=0.1), (Z1, Z2C)),
    ("NTXentMultiplePositives", dict(tau=0.1, conformer_variance_reg=0.5), (Z1, Z2C)),
    ("NTXentMultiplePositivesV2", dict(tau=0.2), (Z1, Z2C)),
    ("NTXentMultiplePositivesV3", dict(tau=0.2), (Z1, Z2C)),
    ("NTXentMultiplePositivesSeparate2D", dict(tau=0.2), (Z1C, Z2C)),
    ("NTXentMinimumMatching", dict(tau=0.2), (Z1C, Z2C)),
    ("MaximumSimilarityMSE", dict(), (Z1C, Z2C)),
    ("NTXentMaximumSimilarity", dict(tau=0.2), (Z1C, Z2C)),
    ("NTXentExtraNegatives", dict(tau=0.2), (Z1, Z2X)),
    ("KLDivergenceMultiplePositives", dict(), (Z1P, Z2C)),
    ("NTXentLikelihoodLoss", dict(tau=0.5), (Z1P, Z2C)),
    ("NTXentMMDSeparate2D", dict(tau=0.2), (Z1C, Z2C)),
    ("JSELossGlobal", dict(), (Z1, Z2)),
])
def test_loss_parity(name, params, args):
    ref_cls = getattr(ref, name)
    ref_val = ref_cls(**params)(*[t(a) for a in args])
    check(name, ref_val.item(), args, params=params)


def test_jsd_multiple_positives_parity():
    # reference computes an O(B^2) python loop (dead code) — slow but fine at B=12
    ref_val = ref.JSDMultiplePositivesLoss(tau=0.5)(t(Z1P), t(Z2C))
    check("JSDMultiplePositivesLoss", ref_val.item(), (Z1P, Z2C),
          params=dict(tau=0.5), tol=1e-3)


def test_kl_v2_vs_fixed_torch():
    """Reference KLDivergenceMultiplePositivesV2 crashes for metric_dim>1
    (stacks [B*B, D] then views to [B, B]); verify our summed-KL fix against a
    corrected torch computation."""
    z1 = t(Z1P)
    z2 = t(Z2C)
    b, d = B, D
    z1v = z1.view(b, 2, d)
    mu1, std1 = z1v[:, 0, :], torch.exp(z1v[:, 1, :] / 2)
    z2v = z2.view(b, -1, d)
    mu2, std2 = z2v.mean(1), z2v.std(1) + 1e-5
    kl = torch.zeros(b, b)
    for i in range(b):
        for jj in range(b):
            p = torch.distributions.Normal(mu1[i], std1[i])
            q = torch.distributions.Normal(mu2[jj], std2[jj])
            kl[i, jj] = torch.distributions.kl.kl_divergence(p, q).sum()
    sim = torch.exp(kl / 5.0)
    pos = torch.diagonal(sim)
    expect = -torch.log(pos / (sim.sum(1) - pos)).mean()
    check("KLDivergenceMultiplePositivesV2", expect.item(), (Z1P, Z2C),
          params=dict(tau=5.0), tol=1e-3)


def test_ntxent_ae_parity():
    dist = RNG.normal(size=(B, 10)).astype(np.float32)
    pred = RNG.normal(size=(B, 10)).astype(np.float32)
    rl, rr = ref.NTXentAE(tau=0.1, reconstruction_reg=0.7)(
        t(Z1), t(Z2), t(dist), t(pred))
    ours = LOSS_REGISTRY["NTXentAE"](tau=0.1, reconstruction_reg=0.7)
    ol, orr = ours(j(Z1), j(Z2), distances=j(dist), distance_pred=j(pred))
    np.testing.assert_allclose(np.asarray(ol), rl.item(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(orr), rr.item(), rtol=2e-4, atol=2e-4)


def test_local_global_parity():
    nodes_per_graph = np.array([3, 2, 4, 1, 2])
    n = nodes_per_graph.sum()
    g = len(nodes_per_graph)
    zn = RNG.normal(size=(n, D)).astype(np.float32)
    zg = RNG.normal(size=(g, D)).astype(np.float32)
    node_graph = np.repeat(np.arange(g), nodes_per_graph).astype(np.int32)

    ref_val = ref.NTXentLocalGlobal(tau=0.3)(t(zn), t(zg), t(nodes_per_graph))
    ours = LOSS_REGISTRY["NTXentLocalGlobal"](tau=0.3)
    got = ours(j(zn), j(zg), node_graph=j(node_graph))
    np.testing.assert_allclose(np.asarray(got), ref_val.item(), rtol=2e-4, atol=2e-4)

    # padded version must match exactly too
    zn_pad = np.concatenate([zn, RNG.normal(size=(5, D)).astype(np.float32)])
    ng_pad = np.concatenate([node_graph, np.full(5, g, np.int32)])
    mask = np.concatenate([np.ones(n, bool), np.zeros(5, bool)])
    got_pad = ours(j(zn_pad), j(zg), node_graph=j(ng_pad), node_mask=j(mask))
    np.testing.assert_allclose(np.asarray(got_pad), ref_val.item(), rtol=2e-4,
                               atol=2e-4)

    ref_gl = ref.NTXentGlobalLocal(tau=0.3)(t(zg), t(zn), t(nodes_per_graph))
    got_gl = LOSS_REGISTRY["NTXentGlobalLocal"](tau=0.3)(
        j(zg), j(zn), node_graph=j(node_graph))
    np.testing.assert_allclose(np.asarray(got_gl), ref_gl.item(), rtol=2e-4,
                               atol=2e-4)


def test_nan_masked_losses_parity():
    target = RNG.normal(size=(B, 4)).astype(np.float32)
    target[RNG.random(target.shape) < 0.3] = np.nan
    pred = RNG.normal(size=(B, 4)).astype(np.float32)
    bin_target = (np.nan_to_num(target) > 0).astype(np.float32)
    bin_target[np.isnan(target)] = np.nan

    ref_val = ref.OGBNanLabelMSELoss()(t(pred), t(target))
    check("OGBNanLabelMSELoss", ref_val.item(), (pred, target))
    ref_val = ref.OGBNanLabelBCEWithLogitsLoss()(t(pred), t(bin_target))
    check("OGBNanLabelBCEWithLogitsLoss", ref_val.item(), (pred, bin_target))


def test_critic_loss_parity():
    z2 = RNG.normal(size=(B, D)).astype(np.float32)
    rec = RNG.normal(size=(B, D, 4)).astype(np.float32)
    ref_val = ref.CriticLoss()(t(z2), t(rec))
    check("CriticLoss", ref_val.item(), (z2, rec))


def test_jse_measures_parity():
    p = RNG.normal(size=(B, 6)).astype(np.float32)
    for measure in ["GAN", "JSD", "X2", "KL", "RKL", "DV", "H2", "W1"]:
        rp = ref.get_positive_expectation(t(p), measure)
        rn = ref.get_negative_expectation(t(p), measure)
        from infomax3d_tpu.losses.contrastive import (
            get_negative_expectation, get_positive_expectation)
        np.testing.assert_allclose(np.asarray(get_positive_expectation(j(p), measure)),
                                   rp.item(), rtol=2e-4, atol=2e-4, err_msg=measure)
        np.testing.assert_allclose(np.asarray(get_negative_expectation(j(p), measure)),
                                   rn.item(), rtol=2e-4, atol=2e-4, err_msg=measure)

"""The contrastive objective zoo — pure-jnp re-implementations of every loss
in reference `commons/losses.py` (1,478 LoC; see SURVEY.md §2.3).

All losses are stateless callables: ``loss(z1, z2, **kw) -> scalar`` (a few
return tuples or take extra args, matching the reference trainer contracts).
Dense [B, B] / [B, B, C, C] similarity einsums map straight onto the MXU; the
batch dimension is static (bucketed batching), so these jit once.

Stochastic losses (`NTXentShuffled`, `SampleLossWrapper`) take an explicit
``key=`` argument instead of global torch RNG.

Registry: `LOSS_REGISTRY` maps the reference YAML `loss_func` names to
classes so reference configs run unmodified (`train.py` resolves
`globals()[args.loss_func]` in the reference).
"""
from __future__ import annotations

import math
from typing import Callable, Dict, Optional

import jax
import numpy as np
import jax.numpy as jnp

LOSS_REGISTRY: Dict[str, Callable] = {}


def register_loss(cls):
    LOSS_REGISTRY[cls.__name__] = cls
    return cls


def get_loss(name: str, **params):
    if name not in LOSS_REGISTRY:
        raise KeyError(f"unknown loss_func '{name}'; known: {sorted(LOSS_REGISTRY)}")
    return LOSS_REGISTRY[name](**params)


# ---------------------------------------------------------------------------
# shared regularizers (reference losses.py:946-964)
# ---------------------------------------------------------------------------

def uniformity_loss(x1: jnp.ndarray, x2: jnp.ndarray, t: float = 2.0) -> jnp.ndarray:
    def _u(x):
        x = x.reshape(x.shape[0], -1) if x.ndim > 2 else x
        sq = jnp.sum((x[:, None, :] - x[None, :, :]) ** 2, axis=-1)
        n = x.shape[0]
        iu = np.triu_indices(n, k=1)
        return jnp.log(jnp.mean(jnp.exp(-t * sq[iu])))
    return (_u(x1) + _u(x2)) / 2.0


def cov_loss(x: jnp.ndarray) -> jnp.ndarray:
    if x.ndim > 2:
        x = x.reshape(-1, x.shape[-1])
    b, d = x.shape
    xc = x - x.mean(axis=0)
    cov = (xc.T @ xc) / (b - 1)
    off = cov - jnp.diag(jnp.diag(cov))
    return jnp.sum(off ** 2) / d


def std_loss(x: jnp.ndarray) -> jnp.ndarray:
    if x.ndim > 2:
        x = x.reshape(-1, x.shape[-1])
    std = jnp.sqrt(x.var(axis=0, ddof=1) + 1e-4)   # torch .var default unbiased
    return jnp.mean(jax.nn.relu(1.0 - std))


class _Regularized:
    """Mixin applying the uniformity/variance/covariance regularizer tail."""

    def __init__(self, uniformity_reg=0.0, variance_reg=0.0, covariance_reg=0.0):
        self.uniformity_reg = uniformity_reg
        self.variance_reg = variance_reg
        self.covariance_reg = covariance_reg

    def _reg(self, loss, z1, z2):
        if self.variance_reg > 0:
            loss = loss + self.variance_reg * (std_loss(z1) + std_loss(z2))
        if self.covariance_reg > 0:
            loss = loss + self.covariance_reg * (cov_loss(z1) + cov_loss(z2))
        if self.uniformity_reg > 0:
            loss = loss + self.uniformity_reg * uniformity_loss(z1, z2)
        return loss


def _cosine_sim_matrix(z1, z2, norm: bool, eps: float = 1e-8):
    sim = jnp.einsum("ik,jk->ij", z1, z2)
    if norm:
        n1 = jnp.linalg.norm(z1, axis=1)
        n2 = jnp.linalg.norm(z2, axis=1)
        sim = sim / (n1[:, None] * n2[None, :] + eps)
    return sim


# ---------------------------------------------------------------------------
# supervised / utility losses (losses.py:13-42)
# ---------------------------------------------------------------------------

@register_loss
class L1Loss:
    def __call__(self, pred, target, **kw):
        return jnp.mean(jnp.abs(pred - target))


@register_loss
class MSELoss:
    def __call__(self, pred, target, **kw):
        return jnp.mean((pred - target) ** 2)


@register_loss
class BCEWithLogitsLoss:
    def __call__(self, pred, target, **kw):
        return jnp.mean(_bce_with_logits(pred, target))


def _bce_with_logits(logits, targets):
    # stable: max(x,0) - x*y + log(1+exp(-|x|))
    return (jax.nn.relu(logits) - logits * targets +
            jnp.log1p(jnp.exp(-jnp.abs(logits))))


@register_loss
class OGBNanLabelBCEWithLogitsLoss:
    """NaN-masked BCE (losses.py:13-21). jit-safe: where-mask, not boolean
    indexing."""

    def __call__(self, pred, target, **kw):
        labeled = ~jnp.isnan(target)
        t = jnp.where(labeled, target, 0.0)
        per = _bce_with_logits(pred, t)
        return jnp.sum(jnp.where(labeled, per, 0.0)) / jnp.maximum(labeled.sum(), 1)


@register_loss
class OGBNanLabelMSELoss:
    def __call__(self, pred, target, **kw):
        labeled = ~jnp.isnan(target)
        t = jnp.where(labeled, target, 0.0)
        per = (pred - t) ** 2
        return jnp.sum(jnp.where(labeled, per, 0.0)) / jnp.maximum(labeled.sum(), 1)


@register_loss
class CriticLoss:
    """Normalized reconstruction MSE for the PhilosophyTrainer (losses.py:33-42)."""

    def __call__(self, z2, reconstruction, **kw):
        z2n = z2 / jnp.maximum(jnp.linalg.norm(z2, axis=1, keepdims=True), 1e-12)
        rn = reconstruction / jnp.maximum(
            jnp.linalg.norm(reconstruction, axis=1, keepdims=True), 1e-12)
        diff = (z2n[..., None] - rn) ** 2
        return jnp.mean(jnp.sum(diff, axis=1))


# ---------------------------------------------------------------------------
# BYOL / Barlow / VICReg (losses.py:45-123)
# ---------------------------------------------------------------------------

@register_loss
class BarlowTwinsLoss(_Regularized):
    def __init__(self, scale_loss=1 / 32, lambd=3.9e-3, **kw):
        super().__init__(**kw)
        self.scale_loss = scale_loss
        self.lambd = lambd

    def __call__(self, z1, z2, **kw):
        b, d = z1.shape
        z1n = (z1 - z1.mean(0)) / z1.std(0, ddof=1)
        z2n = (z2 - z2.mean(0)) / z2.std(0, ddof=1)
        corr = (z1n.T @ z2n) / b
        on = jnp.sum((jnp.diag(corr) - 1.0) ** 2) * self.scale_loss
        off = jnp.sum((corr - jnp.diag(jnp.diag(corr))) ** 2) * self.scale_loss
        return self._reg(on + self.lambd * off, z1, z2)


@register_loss
class CosineSimilarityLoss(_Regularized):
    """BYOL symmetric loss: 2 - 2*cos (losses.py:76-95)."""

    def __call__(self, z1, z2, **kw):
        x = z1 / jnp.maximum(jnp.linalg.norm(z1, axis=-1, keepdims=True), 1e-12)
        y = z2 / jnp.maximum(jnp.linalg.norm(z2, axis=-1, keepdims=True), 1e-12)
        loss = jnp.mean(jnp.sum((x - y) ** 2, axis=-1))
        return self._reg(loss, z1, z2)


@register_loss
class RegularizationLoss(_Regularized):
    """VICReg-style MSE + variance + covariance (losses.py:98-123)."""

    def __init__(self, norm=True, uniformity_reg=0.0, variance_reg=1.0,
                 covariance_reg=0.04):
        super().__init__(uniformity_reg, variance_reg, covariance_reg)

    def __call__(self, z1, z2, **kw):
        return self._reg(jnp.mean((z1 - z2) ** 2), z1, z2)


# ---------------------------------------------------------------------------
# the NT-Xent core family
# ---------------------------------------------------------------------------

@register_loss
class NTXent(_Regularized):
    """SimCLR NT-Xent (losses.py:126-163): pos/(rowsum - pos), -log, mean."""

    def __init__(self, norm=True, tau=0.5, **kw):
        super().__init__(**kw)
        self.norm = norm
        self.tau = tau

    def similarity(self, z1, z2):
        return _cosine_sim_matrix(z1, z2, self.norm)

    def __call__(self, z1, z2, **kw):
        sim = jnp.exp(self.similarity(z1, z2) / self.tau)
        pos = jnp.diag(sim)
        loss = -jnp.mean(jnp.log(pos / (sim.sum(axis=1) - pos)))
        return self._reg(loss, z1, z2)


@register_loss
class NTXentAE(NTXent):
    """NT-Xent + weighted distance-reconstruction MSE, returned as a pair
    (losses.py:165-204) for SelfSupervisedAETrainer."""

    def __init__(self, norm=True, tau=0.5, reconstruction_reg=1.0, **kw):
        super().__init__(norm=norm, tau=tau, **kw)
        self.reconstruction_reg = reconstruction_reg

    def __call__(self, z1, z2, distances=None, distance_pred=None, mask=None, **kw):
        base = NTXent.__call__(self, z1, z2)
        if mask is not None:
            se = (distances - distance_pred) ** 2
            rec = jnp.sum(jnp.where(mask, se, 0.0)) / jnp.maximum(mask.sum(), 1)
        else:
            rec = jnp.mean((distances - distance_pred) ** 2)
        return base, self.reconstruction_reg * rec


@register_loss
class InfoNCE(NTXent):
    """No positive-subtraction denominator (losses.py:998-1034)."""

    def __call__(self, z1, z2, **kw):
        sim = jnp.exp(self.similarity(z1, z2) / self.tau)
        pos = jnp.diag(sim)
        loss = -jnp.mean(jnp.log(pos / sim.sum(axis=1)))
        return self._reg(loss, z1, z2)


class _HardNegativeMixin:
    """Hard-negative reweighting of 'Contrastive Learning with Hard Negative
    Samples' (losses.py:1037-1114)."""

    def _pos_neg(self, z1, z2):
        b = z1.shape[0]
        sim = jnp.exp(_cosine_sim_matrix(z1, z2, self.norm) / self.tau)
        eye = np.eye(b, dtype=bool)
        pos = jnp.diag(sim)
        neg = sim[~eye].reshape(b, b - 1)
        return b, pos, neg

    def _ng(self, b, pos, neg):
        imp = jnp.exp(self.beta * jnp.log(neg))
        reweight = (imp * neg).sum(axis=-1) / imp.mean(axis=-1)
        ng = (-self.tau_plus * (b - 1) * pos + reweight) / (1 - self.tau_plus)
        return jnp.maximum(ng, (b - 1) * math.e ** (-1 / self.tau))


@register_loss
class InfoNCEHard(_HardNegativeMixin):
    def __init__(self, norm=False, tau=0.5, tau_plus=0.1, beta=0.5):
        self.norm, self.tau, self.tau_plus, self.beta = norm, tau, tau_plus, beta

    def __call__(self, z1, z2, **kw):
        b, pos, neg = self._pos_neg(z1, z2)
        ng = self._ng(b, pos, neg)
        return -jnp.mean(jnp.log(pos / (pos + ng)))


@register_loss
class NTXentHard(_HardNegativeMixin):
    def __init__(self, norm=True, tau=0.5, tau_plus=0.1, beta=0.1):
        self.norm, self.tau, self.tau_plus, self.beta = norm, tau, tau_plus, beta

    def __call__(self, z1, z2, **kw):
        b, pos, neg = self._pos_neg(z1, z2)
        ng = self._ng(b, pos, neg)
        return -jnp.mean(jnp.log(pos / ng))


@register_loss
class NTXentShuffled(NTXent):
    """NT-Xent against a randomly permuted z2 (losses.py:967-995). Requires
    an explicit RNG `key` (TPU-native: no global RNG)."""

    def __init__(self, norm=True, tau=0.5):
        super().__init__(norm=norm, tau=tau)

    def __call__(self, z1, z2, key=None, **kw):
        if key is None:
            raise ValueError("NTXentShuffled needs key=jax.random.key(...)")
        z2 = z2[jax.random.permutation(key, z2.shape[0])]
        sim = jnp.exp(self.similarity(z1, z2) / self.tau)
        pos = jnp.diag(sim)
        return -jnp.mean(jnp.log(pos / (sim.sum(axis=1) - pos)))


@register_loss
class SampleLossWrapper:
    """Applies a wrapped loss on a random row subsample (losses.py:1188-1206)."""

    def __init__(self, loss_func, fraction_samples=0.1, **loss_params):
        self.loss = get_loss(loss_func, **loss_params)
        self.fraction = fraction_samples

    def __call__(self, x, y, key=None, **kw):
        if key is None:
            raise ValueError("SampleLossWrapper needs key=jax.random.key(...)")
        n = int(x.shape[0] * self.fraction)
        idx = jax.random.randint(key, (n,), 0, x.shape[0])
        return self.loss(x[idx], y[idx])


# ---------------------------------------------------------------------------
# multiple-positive (conformer) family
# ---------------------------------------------------------------------------

@register_loss
class NTXentMultiplePositives(_Regularized):
    """z2 holds C conformers per molecule: sim summed over conformers BEFORE
    the softmax ratio (losses.py:206-258)."""

    def __init__(self, norm=True, tau=0.5, conformer_variance_reg=0.0, **kw):
        super().__init__(**kw)
        self.norm = norm
        self.tau = tau
        self.conformer_variance_reg = conformer_variance_reg

    def __call__(self, z1, z2, **kw):
        b, d = z1.shape
        z2 = z2.reshape(b, -1, d)                       # [B, C, D]
        sim = jnp.einsum("ik,juk->iju", z1, z2)
        if self.norm:
            n1 = jnp.linalg.norm(z1, axis=1)
            n2 = jnp.linalg.norm(z2, axis=2)
            sim = sim / (n1[:, None, None] * n2[None, :, :])
        sim = jnp.exp(sim / self.tau).sum(axis=2)       # [B, B]
        pos = jnp.diag(sim)
        loss = -jnp.mean(jnp.log(pos / (sim.sum(axis=1) - pos)))
        if self.conformer_variance_reg > 0:
            std = jnp.sqrt(z2.var(axis=1, ddof=1) + 1e-4)
            loss = loss + self.conformer_variance_reg * jnp.mean(jax.nn.relu(1 - std))
        return self._reg(loss, z1, z2)


@register_loss
class NTXentMultiplePositivesV2(_Regularized):
    """Positives from all C conformers, negatives only vs conformer 0
    (losses.py:598-643)."""

    def __init__(self, norm=True, tau=0.5, **kw):
        super().__init__(**kw)
        self.norm = norm
        self.tau = tau

    def __call__(self, z1, z2, **kw):
        b, d = z1.shape
        z2 = z2.reshape(b, -1, d)
        pos = jnp.sum(z1[:, None, :] * z2, axis=2)      # [B, C]
        sim = jnp.einsum("ik,jk->ij", z1, z2[:, 0, :])
        if self.norm:
            n1 = jnp.linalg.norm(z1, axis=1)
            n2 = jnp.linalg.norm(z2, axis=2)
            pos = pos / (n1[:, None] * n2)
            sim = sim / (n1[:, None] * n2[None, :, 0])
        sim = jnp.exp(sim / self.tau)
        pos = jnp.exp(pos / self.tau).sum(axis=1)
        loss = -jnp.mean(jnp.log(pos / (sim.sum(axis=1) - jnp.diag(sim))))
        return self._reg(loss, z1, z2)


@register_loss
class NTXentMultiplePositivesV3(_Regularized):
    """Each conformer an independent positive term (losses.py:646-689)."""

    def __init__(self, norm=True, tau=0.5, **kw):
        super().__init__(**kw)
        self.norm = norm
        self.tau = tau

    def __call__(self, z1, z2, **kw):
        b, d = z1.shape
        z2 = z2.reshape(b, -1, d)
        sim = jnp.einsum("ik,juk->iju", z1, z2)
        if self.norm:
            n1 = jnp.linalg.norm(z1, axis=1)
            n2 = jnp.linalg.norm(z2, axis=2)
            sim = sim / (n1[:, None, None] * n2[None, :, :])
        sim = jnp.exp(sim / self.tau)                   # [B, B, C]
        pos = sim[jnp.arange(b), jnp.arange(b), :]      # [B, C]
        loss = -jnp.mean(jnp.log(pos / (sim.sum(axis=1) - pos)))
        return self._reg(loss, z1, z2)


@register_loss
class NTXentMultiplePositivesSeparate2D(_Regularized):
    """2D side also per-conformer; 4-D similarity tensor (losses.py:692-744)."""

    def __init__(self, norm=True, tau=0.5, **kw):
        super().__init__(**kw)
        self.norm = norm
        self.tau = tau

    def __call__(self, z1, z2, **kw):
        b = z1.shape[0]
        d = z2.shape[-1]
        z1 = z1.reshape(b, -1, d)                        # [B, C, D]
        z2 = z2.reshape(b, -1, d)
        sim = jnp.einsum("ilk,juk->ijlu", z1, z2)
        pos = jnp.sum(z1 * z2, axis=2)                   # [B, C]
        if self.norm:
            n1 = jnp.linalg.norm(z1, axis=2)
            n2 = jnp.linalg.norm(z2, axis=2)
            pos = pos / (n1 * n2)
            sim = sim / jnp.einsum("il,ju->ijlu", n1, n2)
        sim = jnp.exp(sim / self.tau)
        pos = jnp.exp(pos / self.tau).sum(axis=1)
        sim = sim.reshape(b, b, -1).sum(axis=2)
        loss = -jnp.mean(jnp.log(pos / (sim.sum(axis=1) - jnp.diag(sim))))
        return self._reg(loss, z1, z2)


@register_loss
class NTXentMinimumMatching(_Regularized):
    """max over positive conformer pairs / min over negative pairs
    (losses.py:747-794)."""

    def __init__(self, norm=True, tau=0.5, **kw):
        super().__init__(**kw)
        self.norm = norm
        self.tau = tau

    def __call__(self, z1, z2, **kw):
        b = z1.shape[0]
        d = z2.shape[-1]
        z1 = z1.reshape(b, -1, d)
        z2 = z2.reshape(b, -1, d)
        sim = jnp.einsum("ilk,juk->ijlu", z1, z2)
        if self.norm:
            n1 = jnp.linalg.norm(z1, axis=2)
            n2 = jnp.linalg.norm(z2, axis=2)
            sim = sim / jnp.einsum("il,ju->ijlu", n1, n2)
        sim = jnp.exp(sim / self.tau)
        # reference quirk (losses.py:782): the "positive" is the max over the
        # conformer-DIAGONAL of ALL molecule pairs, i.e. max_{j,l} sim[i,j,l,l]
        diag_conf = jnp.diagonal(sim, axis1=2, axis2=3)  # [B, B, C]
        pos = jnp.max(diag_conf, axis=(1, 2))
        min_sim = jnp.min(sim, axis=(2, 3))              # [B, B]
        loss = -jnp.mean(jnp.log(pos / (min_sim.sum(axis=1) - jnp.diag(min_sim))))
        return self._reg(loss, z1, z2)


@register_loss
class MaximumSimilarityMSE(_Regularized):
    """min over conformer-pair MSEs (losses.py:797-837)."""

    def __init__(self, norm=True, tau=0.5, **kw):
        super().__init__(**kw)

    def __call__(self, z1, z2, **kw):
        b = z1.shape[0]
        d = z2.shape[-1]
        z1 = z1.reshape(b, -1, d)
        z2 = z2.reshape(b, -1, d)
        diff = jnp.mean((z1[:, :, None, :] - z2[:, None, :, :]) ** 2, axis=-1)
        loss = jnp.mean(jnp.min(diff, axis=(1, 2)))
        return self._reg(loss, z1, z2)


@register_loss
class NTXentMaximumSimilarity(_Regularized):
    """max over conformer pairs as the similarity (losses.py:839-886)."""

    def __init__(self, norm=True, tau=0.5, **kw):
        super().__init__(**kw)
        self.norm = norm
        self.tau = tau

    def __call__(self, z1, z2, **kw):
        b = z1.shape[0]
        d = z2.shape[-1]
        z1 = z1.reshape(b, -1, d)
        z2 = z2.reshape(b, -1, d)
        sim = jnp.einsum("ilk,juk->ijlu", z1, z2)
        if self.norm:
            n1 = jnp.linalg.norm(z1, axis=2)
            n2 = jnp.linalg.norm(z2, axis=2)
            sim = sim / jnp.einsum("il,ju->ijlu", n1, n2)
        sim = jnp.exp(jnp.max(sim, axis=(2, 3)) / self.tau)
        pos = jnp.diag(sim)
        loss = -jnp.mean(jnp.log(pos / (sim.sum(axis=1) - pos)))
        return self._reg(loss, z1, z2)


@register_loss
class NTXentExtraNegatives(_Regularized):
    """Noised-3D extra negatives appended to z2 (losses.py:889-943)."""

    def __init__(self, norm=True, tau=0.5, extra_negatives_weight=1.0, **kw):
        super().__init__(**kw)
        self.norm = norm
        self.tau = tau
        self.extra_negatives_weight = extra_negatives_weight

    def __call__(self, z1, z2, **kw):
        b, d = z1.shape
        extra = z2[b:].reshape(b, -1, d)                # [B, X, D]
        z2m = z2[:b]
        sim = jnp.einsum("ik,jk->ij", z1, z2m)
        sim_x = jnp.einsum("ik,iuk->iu", z1, extra)
        if self.norm:
            n1 = jnp.linalg.norm(z1, axis=1)
            n2 = jnp.linalg.norm(z2m, axis=1)
            nx = jnp.linalg.norm(extra, axis=-1)
            sim = sim / (n1[:, None] * n2[None, :])
            sim_x = sim_x / (nx * n1[:, None])
        sim_x = jnp.exp(sim_x / self.tau) * self.extra_negatives_weight
        sim = jnp.exp(sim / self.tau)
        full = jnp.concatenate([sim, sim_x], axis=-1)
        pos = jnp.diag(full)
        loss = -jnp.mean(jnp.log(pos / (full.sum(axis=1) - pos)))
        return self._reg(loss, z1, z2)


# ---------------------------------------------------------------------------
# probabilistic 2D head family (mean, logvar) vs conformer sets
# ---------------------------------------------------------------------------

@register_loss
class KLDivergenceMultiplePositives(_Regularized):
    """mean KL(N2 || N1) of diagonal Gaussians (losses.py:261-314)."""

    def __init__(self, norm=False, tau=0.5, **kw):
        super().__init__(**kw)
        self.norm = norm

    def __call__(self, z1, z2, **kw):
        b = z1.shape[0]
        d = z2.shape[-1]
        z1 = z1.reshape(b, 2, d)
        z2 = z2.reshape(b, -1, d)
        if self.norm:
            z1 = z1 / jnp.linalg.norm(z1, axis=2, keepdims=True)
            z2 = z2 / jnp.linalg.norm(z2, axis=2, keepdims=True)
        mu1, var1 = z1[:, 0, :], jnp.exp(z1[:, 1, :])
        mu2 = z2.mean(axis=1)
        var2 = z2.var(axis=1, ddof=1) + 1e-6
        # KL(N(mu2,var2) || N(mu1,var1)) for diagonal Gaussians
        kl = 0.5 * jnp.sum(jnp.log(var1) - jnp.log(var2) - 1.0 +
                           var2 / var1 + (mu1 - mu2) ** 2 / var1, axis=1)
        return self._reg(jnp.mean(kl), z1, z2)


@register_loss
class KLDivergenceMultiplePositivesV2(_Regularized):
    """Pairwise KL kernel as NT-Xent similarity (losses.py:479-534).

    NOTE: the reference implementation crashes for metric_dim > 1 (it stacks
    per-dimension KL vectors and `view`s them to [B, B]); the evident intent —
    and the only shape that runs — is the per-pair KL summed over dimensions,
    which is what we compute."""

    def __init__(self, norm=True, tau=0.5, **kw):
        super().__init__(**kw)
        self.tau = tau

    def __call__(self, z1, z2, **kw):
        b = z1.shape[0]
        d = z2.shape[-1]
        z1 = z1.reshape(b, 2, d)
        mu1, std1 = z1[:, 0, :], jnp.exp(z1[:, 1, :] / 2.0)
        z2 = z2.reshape(b, -1, d)
        mu2 = z2.mean(axis=1)
        std2 = z2.std(axis=1, ddof=1) + 1e-5
        # KL(N(mu1_i,std1_i) || N(mu2_j,std2_j)) per dim, summed
        v1 = std1[:, None, :] ** 2
        v2 = std2[None, :, :] ** 2
        kl = (jnp.log(std2[None, :, :] / std1[:, None, :]) +
              (v1 + (mu1[:, None, :] - mu2[None, :, :]) ** 2) / (2 * v2) - 0.5)
        kl = kl.sum(axis=2)                              # [B, B]
        sim = jnp.exp(kl / self.tau)
        pos = jnp.diag(sim)
        loss = -jnp.mean(jnp.log(pos / (sim.sum(axis=1) - pos)))
        return self._reg(loss, z1, z2)


@register_loss
class JSDMultiplePositivesLoss(_Regularized):
    """KL-based similarity matrix variant (losses.py:317-391; only the
    vectorized `kl_similarity2` feeds the loss — the python-loop variant in
    the reference is dead code and is not reproduced)."""

    def __init__(self, norm=True, tau=0.5, **kw):
        super().__init__(**kw)
        self.norm = norm

    def __call__(self, z1, z2, **kw):
        b = z1.shape[0]
        d = z2.shape[-1]
        z1 = z1.reshape(b, 2, d)
        z2 = z2.reshape(b, -1, d)
        if self.norm:
            z1 = z1 / jnp.linalg.norm(z1, axis=2, keepdims=True)
            z2 = z2 / jnp.linalg.norm(z2, axis=2, keepdims=True)
        mu1 = z1[:, 0, :][None, :, :]                    # [1, B, D] (j index)
        var1 = jnp.exp(z1[:, 1, :])[None, :, :]
        mu2 = z2.mean(axis=1)[:, None, :]                # [B, 1, D] (i index)
        var2 = z2.var(axis=1, ddof=1)[:, None, :]
        log_det_diff = jnp.log((jnp.prod(var2, axis=2) + 1e-5) /
                               jnp.prod(var1, axis=2))
        trace_inv = jnp.sum(var1 / (var2 + 1e-5), axis=2)
        msm = jnp.sum((mu2 - mu1) ** 2 / (var2 + 1e-5), axis=2)
        sim = 0.5 * (log_det_diff - d + trace_inv + msm)  # [B, B]
        pos = jnp.diag(sim)
        loss = -jnp.mean(jnp.log(pos / (sim.sum(axis=1) - pos)))
        return self._reg(loss, z1, z2)


@register_loss
class NTXentLikelihoodLoss(_Regularized):
    """Gaussian likelihood of conformer embeddings under the 2D head's
    (mean, logvar) as similarity (losses.py:537-595)."""

    def __init__(self, norm=True, tau=0.5, conformer_variance_reg=0.0, **kw):
        super().__init__(**kw)
        self.tau = tau
        self.conformer_variance_reg = conformer_variance_reg

    def __call__(self, z1, z2, **kw):
        b = z1.shape[0]
        d = z2.shape[-1]
        z1 = z1.reshape(b, 2, d)
        mu, std = z1[:, 0, :], jnp.exp(z1[:, 1, :] / 2.0)
        z2 = z2.reshape(b, -1, d)                        # [B, C, D]
        # prob[i, j, u, k] = N(z2[j,u,k]; mu[i,k], std[i,k])
        diff = z2[None, :, :, :] - mu[:, None, None, :]
        s = std[:, None, None, :]
        log_prob = -0.5 * (diff / s) ** 2 - jnp.log(s) - 0.5 * math.log(2 * math.pi)
        kernel = jnp.mean(jnp.exp(log_prob), axis=(2, 3))  # [B, B]
        sim = jnp.exp(kernel / self.tau)
        pos = jnp.diag(sim)
        loss = -jnp.mean(jnp.log(pos / (sim.sum(axis=1) - pos)))
        if self.conformer_variance_reg > 0:
            stdc = jnp.sqrt(z2.var(axis=1, ddof=1) + 1e-4)
            loss = loss + self.conformer_variance_reg * jnp.mean(jax.nn.relu(1 - stdc))
        return self._reg(loss, z1, z2)


@register_loss
class NTXentMMDSeparate2D(_Regularized):
    """Multi-kernel MMD between conformer sets as similarity
    (losses.py:394-476)."""

    def __init__(self, norm=True, tau=0.5, kernel_num=5, kernel_mul=2.0, **kw):
        super().__init__(**kw)
        self.norm = norm
        self.tau = tau
        self.kernel_num = kernel_num
        self.kernel_mul = kernel_mul

    def __call__(self, z1, z2, **kw):
        b = z1.shape[0]
        d = z2.shape[-1]
        z1 = z1.reshape(b, -1, d)
        c = z1.shape[1]
        z2 = z2.reshape(b, -1, d)
        if self.norm:
            z1 = z1 / jnp.linalg.norm(z1, axis=2, keepdims=True)
            z2 = z2 / jnp.linalg.norm(z2, axis=2, keepdims=True)
        z1v = jnp.broadcast_to(z1[None], (b, b, c, d))       # j-index on axis 1
        z2v = jnp.broadcast_to(z2[:, None], (b, b, c, d))    # i-index on axis 0
        total = jnp.concatenate([z1v, z2v], axis=2)          # [B, B, 2C, D]
        n = 2 * c
        l2 = jnp.sum((total[:, :, None, :, :] - total[:, :, :, None, :]) ** 2,
                     axis=4)                                  # [B, B, 2C, 2C]
        bw = jax.lax.stop_gradient(jnp.sum(l2, axis=(2, 3))) / (n * n - n)
        bw = bw / self.kernel_mul ** (self.kernel_num // 2)
        kv = sum(jnp.exp(-l2 / (bw * self.kernel_mul ** i)[:, :, None, None])
                 for i in range(self.kernel_num))
        xx = kv[:, :, :c, :c]
        yy = kv[:, :, c:, c:]
        xy = kv[:, :, :c, c:]
        yx = kv[:, :, c:, :c]
        mmd = jnp.mean(xx + yy - xy - yx, axis=(2, 3))
        sim = jnp.exp((1.0 / (mmd + 1.0)) / self.tau)
        pos = jnp.diag(sim)
        loss = -jnp.mean(jnp.log(pos / (sim.sum(axis=1) - pos)))
        return self._reg(loss, z1, z2)


# ---------------------------------------------------------------------------
# local-global node/graph contrast (losses.py:1117-1185)
# ---------------------------------------------------------------------------

@register_loss
class NTXentLocalGlobal:
    """Node-vs-graph NT-Xent with block positive mask built from node->graph
    segment ids.

    TPU-native difference: instead of the reference's cumsum loop over
    `nodes_per_graph` we take `node_graph` segment ids directly (identical
    mask).  Padding nodes (id == n_graphs) contribute nothing.
    """

    def __init__(self, norm=True, tau=0.5, **kw):
        self.norm = norm
        self.tau = tau

    def __call__(self, zn, zg, node_graph=None, node_mask=None, **kw):
        g = zg.shape[0]
        pos_mask = (node_graph[:, None] == np.arange(g)[None, :]).astype(zn.dtype)
        if node_mask is not None:
            pos_mask = pos_mask * node_mask[:, None]
            valid = node_mask[:, None].astype(zn.dtype)
        else:
            valid = jnp.ones((zn.shape[0], 1), zn.dtype)
        neg_mask = valid - pos_mask
        sim = jnp.einsum("ik,jk->ij", zn, zg)
        if self.norm:
            nn_ = jnp.linalg.norm(zn, axis=1)
            ng = jnp.linalg.norm(zg, axis=1)
            sim = sim / (nn_[:, None] * ng[None, :] + 1e-10)
        sim = jnp.exp(sim / self.tau)
        pos = (sim * pos_mask).sum(axis=1)
        neg = (sim * neg_mask).sum(axis=1)
        ratio = jnp.where(pos > 0, pos / jnp.maximum(neg, 1e-12), 1.0)
        if node_mask is not None:
            return -jnp.sum(jnp.where(node_mask, jnp.log(ratio), 0.0)) / \
                jnp.maximum(node_mask.sum(), 1)
        return -jnp.mean(jnp.log(ratio))


@register_loss
class NTXentGlobalLocal(NTXentLocalGlobal):
    """Arguments switched (losses.py:1164-1185)."""

    def __call__(self, zg, zn, node_graph=None, node_mask=None, **kw):
        return super().__call__(zn, zg, node_graph=node_graph, node_mask=node_mask)


# ---------------------------------------------------------------------------
# JSE / MVGRL divergence family (losses.py:1209-1477)
# ---------------------------------------------------------------------------

LOG_2 = math.log(2.0)


def get_positive_expectation(p_samples, measure, average=True):
    if measure == "GAN":
        ep = -jax.nn.softplus(-p_samples)
    elif measure == "JSD":
        ep = LOG_2 - jax.nn.softplus(-p_samples)
    elif measure == "X2":
        ep = p_samples ** 2
    elif measure in ("KL", "DV", "W1"):
        ep = p_samples
    elif measure == "RKL":
        ep = -jnp.exp(-p_samples)
    elif measure == "H2":
        ep = 1.0 - jnp.exp(-p_samples)
    else:
        raise ValueError(f"measure does not exist: {measure}")
    return ep.mean() if average else ep


def get_negative_expectation(q_samples, measure, average=True):
    if measure == "GAN":
        eq = jax.nn.softplus(-q_samples) + q_samples
    elif measure == "JSD":
        eq = jax.nn.softplus(-q_samples) + q_samples - LOG_2
    elif measure == "X2":
        eq = -0.5 * ((jnp.sqrt(q_samples ** 2) + 1.0) ** 2)
    elif measure == "KL":
        eq = jnp.exp(q_samples - 1.0)
    elif measure == "RKL":
        eq = q_samples - 1.0
    elif measure == "DV":
        eq = jax.nn.logsumexp(q_samples, axis=0) - math.log(q_samples.shape[0])
    elif measure == "H2":
        eq = jnp.exp(q_samples) - 1.0
    elif measure == "W1":
        eq = q_samples
    else:
        raise ValueError(f"measure does not exist: {measure}")
    return eq.mean() if average else eq


def jse_global_global(z1, z2):
    """JSD estimator between two global views (losses.py:1356-1376), using the
    softplus `get_expectation` form of the reference."""
    g = z1.shape[0]
    d = jnp.matmul(z1, z2.T)
    eye = np.eye(g, dtype=d.dtype)
    pos_score = LOG_2 - jax.nn.softplus(-(d * eye))
    neg_score = jax.nn.softplus(-(d * (1 - eye))) + d * (1 - eye) - LOG_2
    e_pos = jnp.sum(pos_score * 1.0) / g          # reference sums ALL entries
    e_neg = jnp.sum(neg_score * 1.0) / (g * (g - 1))
    # NOTE: reference sums the full masked matrices (incl. zero entries whose
    # softplus(0) contributes log2-log2=0 for pos and 0 for neg after shift);
    # softplus(0)=log2 so masked entries contribute exactly 0 in both sums.
    return e_neg - e_pos


def jse_local_global(zg, zn, node_graph, node_mask=None, measure="JSD"):
    """MVGRL local-global JSE (losses.py:1330-1353) with segment-id masks."""
    n = zn.shape[0]
    g = zg.shape[0]
    pos_mask = (node_graph[:, None] == np.arange(g)[None, :]).astype(zn.dtype)
    if node_mask is not None:
        pos_mask = pos_mask * node_mask[:, None]
        valid = node_mask[:, None].astype(zn.dtype)
        n_real = node_mask.sum()
    else:
        valid = jnp.ones((n, 1), zn.dtype)
        n_real = n
    neg_mask = valid - pos_mask
    d = jnp.matmul(zn, zg.T)
    e_pos = get_positive_expectation(d * pos_mask, measure, average=False).sum() / n_real
    e_neg = get_negative_expectation(d * neg_mask, measure, average=False).sum() / \
        (n_real * (g - 1))
    return e_neg - e_pos


@register_loss
class JSELossGlobal:
    def __init__(self, **kw):
        pass

    def __call__(self, z1, z2, **kw):
        return jse_global_global(z1, z2)


@register_loss
class JSELoss:
    """Multi-view JSE combiner (losses.py:1252-1298)."""

    def __init__(self, neg_by_crpt=False, **kw):
        self.neg_by_crpt = neg_by_crpt

    def __call__(self, zs, zs_n=None, node_graph=None, node_mask=None,
                 sigma=None, **kw):
        import itertools
        if zs_n is not None:
            jse = jse_local_global
            if len(zs) == 1:
                return jse(zs[0], zs_n[0], node_graph, node_mask)
            if len(zs) == 2:
                return (jse(zs[0], zs_n[1], node_graph, node_mask) +
                        jse(zs[1], zs_n[0], node_graph, node_mask))
            loss = 0.0
            for i, j in itertools.combinations(range(len(zs)), 2):
                if sigma[i][j]:
                    loss += (jse(zs[i], zs_n[j], node_graph, node_mask) +
                             jse(zs[j], zs_n[i], node_graph, node_mask))
            return loss
        if len(zs) == 2:
            return jse_global_global(zs[0], zs[1])
        loss = 0.0
        for i, j in itertools.combinations(range(len(zs)), 2):
            if sigma[i][j]:
                loss += jse_global_global(zs[i], zs[j])
        return loss

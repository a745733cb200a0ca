"""On-chip (real TPU) parity verification for ALL Pallas kernels.

The test suite proves the kernels in interpret mode (exact math on CPU);
this script re-proves them against their XLA fallbacks on the actual chip,
where Mosaic's MXU rounding, DMA clamping, and lane packing are live:

1. csr_pna_stats (bf16 fused stats) — fwd vs the mailbox-gather reference,
   grads vs the analytic formula run through XLA gathers.
2. csr_pna_stats with a folded affine (AffinePart) — fwd+grads (x, scale,
   shift) vs materializing m = x*a + b first.
3. csr_edge_combine — fwd vs take+take+add; grads vs the take formula.
4. pair_segment_sum_bf16 / snd_segment_sum_bf16 — vs jax segment_sum by
   receiver and sender (exact: f32 accumulation of <= max_deg bf16 values
   is order-independent).

Prints one JSON line per check; exits non-zero on failure.

  python tools/verify_onchip.py
"""
from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from infomax3d_tpu.data.synthetic import SyntheticMolecules
    from infomax3d_tpu.graphs.batch import (BucketSpec, batch_graphs,
                                            to_graph_batch)
    from infomax3d_tpu.ops.pallas import spmm

    if jax.default_backend() == "cpu":
        print(json.dumps({"check": "backend", "ok": False,
                          "note": "no TPU — run the interpret-mode tests"}))
        return 1

    rng = np.random.default_rng(0)
    ds = SyntheticMolecules(64, seed=3, n_min=8, n_max=22)
    mols = [ds.graph2d(i) for i in range(64)]
    maxdeg = max(int(np.bincount(m["receivers"]).max()) for m in mols)
    n_tot = sum(m["node_feat"].shape[0] for m in mols)
    e_tot = sum(m["senders"].shape[0] for m in mols)
    g = to_graph_batch(batch_graphs(mols, BucketSpec(
        64, ((n_tot + 255) // 256) * 256, ((e_tot + 511) // 512) * 512,
        max_deg=maxdeg, csr=True)))
    rp = g.extras["csr_row_ptr"]
    N, E, D = g.num_nodes, g.senders.shape[0], 200
    tw = g.extras["csr_tile_win"].shape[0]
    bs = g.extras["csr_bwd_span"].shape[0]
    pos = g.extras["csr_pos"]
    msgs = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32),
                       jnp.bfloat16)
    fails = 0

    def report(check, diff, tol, extra=None):
        nonlocal fails
        ok = bool(diff <= tol)
        fails += not ok
        print(json.dumps({"check": check, "maxdiff": float(diff),
                          "tol": tol, "ok": ok, **(extra or {})}))

    # 1. stats fwd vs mailbox reference -------------------------------
    outs = jax.jit(lambda m: spmm.csr_pna_stats(
        m, rp, g.receivers, pos, maxdeg, False, tw, bs))(msgs)
    ref = spmm._csr_stats_mailbox_raw(msgs, rp, maxdeg)
    dmax = max(float(jnp.abs(a.astype(jnp.float32)
                             - b.astype(jnp.float32)).max())
               for a, b in zip(outs, ref[:5]))
    report("stats_fwd_vs_mailbox", dmax, 0.02)

    # stats grads: weighted-sum loss, kernel vs XLA-gather analytic bwd
    w = [jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
         for _ in range(5)]

    def loss_k(m):
        o = spmm.csr_pna_stats(m, rp, g.receivers, pos, maxdeg, False,
                               tw, bs)
        return sum((x.astype(jnp.float32) * wi).sum()
                   for x, wi in zip(o, w))

    def loss_x(m):
        o = spmm.csr_pna_stats(m, rp, g.receivers, None, maxdeg, False,
                               tw, 0)        # bwd_span=0 -> XLA gather bwd
        return sum((x.astype(jnp.float32) * wi).sum()
                   for x, wi in zip(o, w))

    gk = jax.jit(jax.grad(loss_k))(msgs).astype(jnp.float32)
    gx = jax.jit(jax.grad(loss_x))(msgs).astype(jnp.float32)
    scale = float(jnp.abs(gx).max()) + 1e-9
    report("stats_bwd_kernel_vs_xla", float(jnp.abs(gk - gx).max()) / scale,
           0.02, {"rel_to": scale})

    # 2. stats with folded affine vs materialized ----------------------
    a = jnp.asarray(0.5 + rng.random(D).astype(np.float32))
    b = jnp.asarray(rng.normal(size=D).astype(np.float32))

    def loss_aff(m, a, b):
        o = spmm.csr_pna_stats(m, rp, g.receivers, pos, maxdeg, False,
                               tw, bs, True, (a, b))
        return sum((x.astype(jnp.float32) * wi).sum()
                   for x, wi in zip(o, w))

    def loss_mat(m, a, b):
        mm = (m.astype(jnp.float32) * a + b).astype(jnp.bfloat16)
        o = spmm.csr_pna_stats(mm, rp, g.receivers, pos, maxdeg, False,
                               tw, bs)
        return sum((x.astype(jnp.float32) * wi).sum()
                   for x, wi in zip(o, w))

    va = jax.jit(loss_aff)(msgs, a, b)
    vm = jax.jit(loss_mat)(msgs, a, b)
    report("stats_affine_fwd", abs(float(va) - float(vm))
           / (abs(float(vm)) + 1e-9), 1e-3)
    ga = jax.jit(jax.grad(loss_aff, argnums=(0, 1, 2)))(msgs, a, b)
    gm = jax.jit(jax.grad(loss_mat, argnums=(0, 1, 2)))(msgs, a, b)
    for got, want, nm in zip(ga, gm, ["x", "scale", "shift"]):
        got = jnp.asarray(got, jnp.float32)
        want = jnp.asarray(want, jnp.float32)
        s = float(jnp.abs(want).max()) + 1e-9
        report(f"stats_affine_grad_{nm}",
               float(jnp.abs(got - want).max()) / s, 0.03)

    # 3. edge combine ---------------------------------------------------
    hd = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32), jnp.bfloat16)
    hs = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32), jnp.bfloat16)
    pe = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32), jnp.bfloat16)
    cspan = g.extras["csr_cmb_span"].shape[0]
    pb = g.extras["csr_pair_base"]
    pw = g.extras["csr_pair_win"].shape[0]
    emask = (np.asarray(g.receivers) < N).astype(np.float32)[:, None]
    wm = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32)) * emask

    def fused(hd, hs, pe):
        z = spmm.csr_edge_combine(hd, hs, pe, g.receivers, g.senders, rp,
                                  g.extras["csc_row_ptr"],
                                  g.extras["csc_perm"], pb, maxdeg, tw,
                                  g.extras["csc_tile_win"].shape[0],
                                  cspan, False, pw)
        return (z.astype(jnp.float32) * wm).sum()

    def plain(hd, hs, pe):
        z = (jnp.take(hd, g.receivers.clip(0, N - 1), axis=0)
             .astype(jnp.float32)
             + jnp.take(hs, g.senders.clip(0, N - 1), axis=0)
             .astype(jnp.float32)
             + pe.astype(jnp.float32))
        return (z * wm).sum()

    vf = jax.jit(fused)(hd, hs, pe)
    vp = jax.jit(plain)(hd, hs, pe)
    report("combine_fwd", abs(float(vf) - float(vp))
           / (abs(float(vp)) + 1e-9), 2e-2)
    gf = jax.jit(jax.grad(fused, argnums=(0, 1, 2)))(hd, hs, pe)
    gp = jax.jit(jax.grad(plain, argnums=(0, 1, 2)))(hd, hs, pe)
    for got, want, nm in zip(gf, gp, ["hd", "hs", "pe"]):
        got = jnp.asarray(got, jnp.float32)
        want = jnp.asarray(want, jnp.float32)
        s = float(jnp.abs(want).max()) + 1e-9
        report(f"combine_grad_{nm}",
               float(jnp.abs(got - want).max()) / s, 0.03)

    # 4. pair / sender seg-sum ------------------------------------------
    ct = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32),
                     jnp.bfloat16)
    d_hd, d_hs = jax.jit(lambda c: spmm.pair_segment_sum_bf16(
        c, g.senders, rp, pb, pw))(ct)
    ref_hd = jax.ops.segment_sum(
        ct.astype(jnp.float32), jnp.minimum(g.receivers, N),
        num_segments=N + 1)[:N].astype(jnp.bfloat16).astype(jnp.float32)
    ref_hs = jax.ops.segment_sum(
        ct.astype(jnp.float32), jnp.minimum(g.senders, N),
        num_segments=N + 1)[:N].astype(jnp.bfloat16).astype(jnp.float32)
    report("pair_dhd", float(jnp.abs(d_hd.astype(jnp.float32)
                                     - ref_hd).max()), 0.0)
    report("pair_dhs", float(jnp.abs(d_hs.astype(jnp.float32)
                                     - ref_hs).max()), 0.0)
    d_s = jax.jit(lambda c: spmm.snd_segment_sum_bf16(
        c, g.senders, pb, pw))(ct)[:N]
    report("snd_only", float(jnp.abs(d_s.astype(jnp.float32)
                                     - ref_hs).max()), 0.0)

    print(json.dumps({"check": "TOTAL", "ok": fails == 0,
                      "failures": fails}))
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())

"""On-chip validation + A/B for the fused bf16 stats kernel.

Run the moment the TPU tunnel is back (round-3 candidate #1 — the kernel
shipped in round 2 with CPU interpret-mode parity only):

  python tools/tpu_validate_stats_kernel.py

Steps:
1. preflight compile (ops/pallas/spmm.py::preflight_stats_kernel),
2. fwd+bwd parity vs the f32 csr_multi_reduce path on a realistic CSR
   batch (bf16-appropriate tolerances),
3. bench.py A/B: INFOMAX3D_STATS_KERNEL=1 vs =0 (reads .bench_history.json
   between runs and restores it afterwards).

Prints one JSON line per step and exits non-zero on parity failure.
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def parity(interpret: bool = False):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from infomax3d_tpu.ops.pallas import spmm

    rng = np.random.default_rng(0)
    # degree-capped CSR batch INSIDE the production dispatch envelope:
    # _use_stats_kernel routes to this kernel only for max_deg <= 16 (the
    # winner-slot encoding packs amax + 16*amin), so validate at the
    # envelope's edge, not beyond it.  (This tool used to pass max_deg
    # positionally into the old signature and silently validated with
    # max_deg 0/1 — advisor r4; uniform-random receivers then gave
    # max_deg 24, which the dispatcher would never send here.)
    N, D = 2048, 200
    degs = rng.integers(0, 13, N)
    row_ptr = np.concatenate([[0], np.cumsum(degs)]).astype(np.int32)
    E_real = int(row_ptr[-1])
    # kernel contract: the [E, D] message rows are padded to a 512 multiple
    # (window clamping reads whole blocks past row_ptr[-1]; the production
    # batcher always pads edge buckets this way — graphs/batch.py)
    E = int(np.ceil(E_real / 512) * 512)
    recv = np.concatenate([
        np.repeat(np.arange(N, dtype=np.int32), degs),
        np.full(E - E_real, N, np.int32)])
    msgs = rng.normal(size=(E, D)).astype(np.float32)
    from infomax3d_tpu.ops.pallas.spmm import _use_stats_kernel
    assert not _use_stats_kernel(jnp.zeros((4, 4), jnp.bfloat16), 17), \
        "dispatch gate for max_deg > 16 disappeared — this scenario no " \
        "longer covers the production envelope"
    msgs_bf = jnp.asarray(msgs, jnp.bfloat16)
    rp, rc = jnp.asarray(row_ptr), jnp.asarray(recv)
    md = int(np.diff(row_ptr).max())

    def k_out(m):
        s1, mean, std, mx, mn = spmm.csr_pna_stats(
            m, rp, rc, max_deg=md, interpret=interpret)
        return jnp.stack([s1.astype(jnp.float32), mean.astype(jnp.float32),
                          std.astype(jnp.float32), mx.astype(jnp.float32),
                          mn.astype(jnp.float32)])

    def f_out(m):
        s1, s2, mx, mn = spmm.csr_multi_reduce(m.astype(jnp.float32),
                                               rp, rc, md, interpret)
        deg = jnp.maximum((rp[1:] - rp[:-1]).astype(jnp.float32), 1.0)[:, None]
        mean = s1 / deg
        var = jax.nn.relu(s2 / deg - mean ** 2) + spmm.EPS
        return jnp.stack([s1, mean, jnp.sqrt(var), mx, mn])

    def k_out_interp(m):
        s = spmm.csr_pna_stats(m, rp, rc, max_deg=md, interpret=True)
        return jnp.stack([x.astype(jnp.float32) for x in s])

    # fwd: hardware kernel vs the f32 csr_multi_reduce path (ground truth,
    # bf16-output budget).  The interpret-mode comparison is INFORMATIONAL
    # only: on the TPU backend interpret runs the kernel body as plain XLA
    # ops under --xla_allow_excess_precision, which legally drops the hi/lo
    # sumsq split's intermediate bf16 rounding — measured on v5e the Mosaic
    # kernel's std is CLOSER to exact f32 (2.7e-3) than interpret's (5.6e-2),
    # so "hw == interp" is the wrong acceptance criterion on hardware.
    got = np.asarray(jax.jit(k_out)(msgs_bf))
    want_i = np.asarray(jax.jit(k_out_interp)(msgs_bf)) if not interpret \
        else got
    want_f = np.asarray(jax.jit(f_out)(msgs_bf))
    rel_i = (np.abs(got - want_i).max(axis=(1, 2)) /
             (np.abs(want_i).max(axis=(1, 2)) + 1e-9))
    rel_f = (np.abs(got - want_f).max(axis=(1, 2)) /
             (np.abs(want_f).max(axis=(1, 2)) + 1e-9))
    # Loose hw-vs-interp sanity bound: interpret's excess precision means it
    # is not the ground truth (see the comment above), but a catastrophic
    # lowering regression (rel ~ 1.0) should still fail the harness even
    # when f32 parity happens to hold on this one shape.
    # interpret mode legally drops the hi/lo sumsq split's intermediate
    # bf16 rounding (see above) — its std sits ~6e-2 off exact f32 where
    # the Mosaic kernel is ~3e-3, so the self-check budget is looser
    fwd_tol = 0.08 if interpret else 0.05
    ok_fwd = bool((rel_f < fwd_tol).all() and (rel_i < 0.5).all())

    # bwd, smooth part (sum/mean/std cotangents; zero on max/min): strict —
    # the analytic VJP has no tie-routing freedom here.  max/min cotangents
    # route by bf16-equality (ALL rounding-ties receive the cotangent, by
    # design — ops/pallas/spmm.py::_bwd), so vs the f32 path only the
    # outlier FRACTION is bounded.
    ct = rng.normal(size=(5, N, D)).astype(np.float32)
    ct_smooth = ct.copy()
    ct_smooth[3:] = 0.0
    ct, ct_smooth = jnp.asarray(ct), jnp.asarray(ct_smooth)

    def grad_of(fn, c):
        return np.asarray(jax.jit(jax.grad(
            lambda m: jnp.sum(fn(m) * c)))(msgs_bf).astype(jnp.float32))

    gk_s = grad_of(k_out, ct_smooth)
    gf_s = grad_of(f_out, ct_smooth)
    gi_s = grad_of(k_out_interp, ct_smooth) if not interpret else gk_s
    # primary: hardware vs the f32 path, at the budget the model-level bf16
    # parity test established (0.15 of global max — bf16 mean/std rounding
    # amplified by small-std nodes).  hw-vs-interp is informational (see the
    # fwd comment: interpret is the less exact of the two on this backend —
    # its excess-precision residuals shift the 1/std backward weights).
    # The strict bound applies only where the backward is WELL-CONDITIONED:
    # the std cotangent path divides by std[recv], so wherever a segment's
    # per-feature f32 std is small (deg-1 nodes: exactly sqrt(EPS); deg-2/3
    # nodes whose samples happen to agree) the kernel's bf16 fwd-output
    # rounding is amplified ~1/std on BOTH paths with unmatched direction —
    # pure quantization noise, the same conditioning caveat
    # tests/test_trajectory_golden.py documents.  The ill-conditioned tail
    # is still guarded by the global outlier FRACTION below.
    std_f = np.asarray(jax.jit(f_out)(msgs_bf))[2]          # [N, D] f32 std
    e_recv = np.minimum(recv, N - 1)
    e_deg = np.concatenate([np.repeat(degs, degs),
                            np.zeros(E - E_real, np.int64)])
    smooth_ok = (std_f[e_recv] >= 0.25) & (e_deg >= 2)[:, None]
    hw_rel = (np.abs(gk_s - gi_s) * smooth_ok).max() / \
        ((np.abs(gi_s) * smooth_ok).max() + 1e-9)
    sm_rel = (np.abs(gk_s - gf_s) * smooth_ok).max() / \
        ((np.abs(gf_s) * smooth_ok).max() + 1e-9)
    gk = grad_of(k_out, ct)
    gf = grad_of(f_out, ct)
    big = np.abs(gk - gf) > 0.02 * (np.abs(gf).max() + 1e-9)
    outlier_frac = float(big.mean())
    ok_bwd = bool(np.isfinite(gk).all() and
                  sm_rel < 0.15 and outlier_frac < 0.02 and hw_rel < 0.5)
    print(json.dumps({"step": "parity",
                      "fwd_rel_vs_interp": rel_i.tolist(),
                      "fwd_rel_vs_f32": rel_f.tolist(),
                      "bwd_hw_vs_interp_rel": float(hw_rel),
                      "bwd_smooth_rel_vs_f32": float(sm_rel),
                      "bwd_tie_outlier_frac": outlier_frac,
                      "ok_fwd": ok_fwd, "ok_bwd": ok_bwd}))
    return ok_fwd and ok_bwd


def bench_ab():
    hist = os.path.join(REPO, ".bench_history.json")
    backup = hist + ".bak"
    if os.path.exists(hist):
        shutil.copy(hist, backup)
    results = {}
    try:
        for flag in ("1", "0"):
            env = dict(os.environ, INFOMAX3D_STATS_KERNEL=flag)
            out = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py")],
                env=env, capture_output=True, text=True, timeout=1200)
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("{")]
            results[flag] = json.loads(line[-1]) if line else \
                {"error": out.stderr[-500:]}
            print(json.dumps({"step": f"bench kernel={flag}",
                              **results[flag]}))
    finally:
        if os.path.exists(backup):
            shutil.move(backup, hist)
    return results


def main():
    import jax
    from infomax3d_tpu.ops.pallas.spmm import preflight_stats_kernel
    if os.environ.get("INFOMAX3D_VALIDATE_INTERPRET") == "1":
        # CPU self-check of this script's logic (tests/test_pallas_spmm.py
        # covers the kernel math; this validates the harness)
        ok = parity(interpret=True)
        print(json.dumps({"verdict": "PASS" if ok else "PARITY FAIL",
                          "mode": "interpret"}))
        return 0 if ok else 2
    dev = str(jax.devices()[0])
    ok_pre = preflight_stats_kernel()
    print(json.dumps({"step": "preflight", "device": dev, "ok": ok_pre}))
    if not ok_pre:
        print(json.dumps({"verdict": "kernel rejected on-chip; dispatch "
                                     "falls back (keep the gate)"}))
        return 1
    ok = parity()
    bench_ab()
    print(json.dumps({"verdict": "PASS" if ok else "PARITY FAIL"}))
    return 0 if ok else 2


if __name__ == "__main__":
    sys.exit(main())

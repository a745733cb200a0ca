"""Unit tests for segment ops vs dense numpy references (SURVEY.md §4 item 1)."""
import numpy as np
import jax.numpy as jnp
import pytest

from infomax3d_tpu.ops.segment import (
    EPS, degree, graph_readout, pna_multi_aggregate, segment_max, segment_mean,
    segment_min, segment_softmax, segment_sum,
)


def dense_groups(data, ids, num_segments):
    return [data[ids == s] for s in range(num_segments)]


@pytest.fixture
def case(rng):
    E, N, D = 200, 37, 8
    ids = rng.integers(0, N + 1, size=E)      # N == out-of-range padding
    data = rng.normal(size=(E, D)).astype(np.float32)
    return data, ids.astype(np.int32), N, D


def test_segment_sum_drops_out_of_range(case):
    data, ids, N, D = case
    out = np.asarray(segment_sum(jnp.asarray(data), jnp.asarray(ids), N))
    for s, grp in enumerate(dense_groups(data, ids, N)):
        np.testing.assert_allclose(out[s], grp.sum(0) if len(grp) else 0.0,
                                   rtol=1e-5, atol=1e-5)


def test_segment_mean_max_min_empty_is_zero(case):
    data, ids, N, D = case
    mean = np.asarray(segment_mean(jnp.asarray(data), jnp.asarray(ids), N))
    mx = np.asarray(segment_max(jnp.asarray(data), jnp.asarray(ids), N))
    mn = np.asarray(segment_min(jnp.asarray(data), jnp.asarray(ids), N))
    for s, grp in enumerate(dense_groups(data, ids, N)):
        if len(grp):
            np.testing.assert_allclose(mean[s], grp.mean(0), rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(mx[s], grp.max(0), rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(mn[s], grp.min(0), rtol=1e-5, atol=1e-5)
        else:
            assert (mean[s] == 0).all() and (mx[s] == 0).all() and (mn[s] == 0).all()


def test_segment_softmax(case):
    data, ids, N, D = case
    out = np.asarray(segment_softmax(jnp.asarray(data), jnp.asarray(ids), N))
    for s in range(N):
        sel = ids == s
        if sel.sum():
            e = np.exp(data[sel] - data[sel].max(0))
            np.testing.assert_allclose(out[sel], e / e.sum(0), rtol=1e-4, atol=1e-5)


def test_pna_multi_aggregate_matches_dense(case):
    """Reproduce the reference mailbox math (models/pna.py:17-68) densely."""
    data, ids, N, D = case
    aggs = ["mean", "max", "min", "std", "var", "moment3", "moment4", "moment5", "sum"]
    scalers = ["identity", "amplification", "attenuation"]
    out = np.asarray(pna_multi_aggregate(jnp.asarray(data), jnp.asarray(ids), N,
                                         aggs, scalers, avg_d_log=1.0))
    deg = np.asarray(degree(jnp.asarray(ids), N))
    for s, grp in enumerate(dense_groups(data, ids, N)):
        if not len(grp):
            np.testing.assert_allclose(out[s], 0.0, atol=1e-6)
            continue
        cols, care = [], []
        mean = grp.mean(0)
        var = np.maximum(np.mean(grp * grp, 0) - mean * mean, 0.0)
        for a in aggs:
            ok = np.ones(D, dtype=bool)
            if a == "mean":
                cols.append(mean)
            elif a == "max":
                cols.append(grp.max(0))
            elif a == "min":
                cols.append(grp.min(0))
            elif a == "std":
                cols.append(np.sqrt(var + EPS))
            elif a == "var":
                cols.append(var)
            elif a == "sum":
                cols.append(grp.sum(0))
            else:
                n = int(a[len("moment"):])
                mn = np.mean((grp - mean) ** n, 0)
                cols.append(np.sign(mn) * np.abs(np.abs(mn) + EPS) ** (1.0 / n))
                # sign(x)*(|x|+EPS)^(1/n) is fp-noise-dependent when the true
                # moment is ~0 (odd moments at degree 2); torch has the same
                # knife-edge — skip those entries.
                ok = np.abs(mn) > 1e-5
            care.append(ok)
        h = np.concatenate(cols)
        ok = np.tile(np.concatenate(care), len(scalers))
        log_deg = np.log(deg[s] + 1.0)
        expect = np.concatenate([h, h * log_deg, h / log_deg])
        np.testing.assert_allclose(out[s][ok], expect[ok], rtol=2e-3, atol=2e-3)


def test_graph_readout(rng):
    N, G, D = 50, 7, 5
    ids = rng.integers(0, G + 1, size=N).astype(np.int32)
    data = rng.normal(size=(N, D)).astype(np.float32)
    out = np.asarray(graph_readout(jnp.asarray(data), jnp.asarray(ids), G,
                                   ["min", "max", "mean", "sum"]))
    assert out.shape == (G, 4 * D)
    for s in range(G):
        grp = data[ids == s]
        if len(grp):
            np.testing.assert_allclose(
                out[s], np.concatenate([grp.min(0), grp.max(0), grp.mean(0), grp.sum(0)]),
                rtol=1e-5, atol=1e-5)

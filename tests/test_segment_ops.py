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


def test_sorted_segment_sum_matches_scatter(rng):
    from infomax3d_tpu.ops.segment import sorted_segment_sum, take_rows
    import jax

    E, N, D = 700, 201, 24                  # E not a multiple of the block
    deg = rng.integers(0, 6, size=N)
    ids = np.repeat(np.arange(N), deg)
    e_real = len(ids)
    assert e_real < E
    ids = np.concatenate([ids, np.full(E - e_real, N)])  # padding sorts last
    row_ptr = np.zeros(N + 1, np.int32)
    row_ptr[1:] = np.cumsum(np.bincount(ids[ids < N], minlength=N))
    data = rng.normal(size=(E, D)).astype(np.float32)
    data[e_real:] = rng.normal(size=(E - e_real, D))  # junk in padding rows

    ref = np.zeros((N, D), np.float32)
    np.add.at(ref, ids[:e_real], data[:e_real])
    out = np.asarray(sorted_segment_sum(jnp.asarray(data),
                                        jnp.asarray(row_ptr), block=64))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    # take_rows backward via row_ptr == scatter backward
    nodes = rng.normal(size=(N, D)).astype(np.float32)
    ct = rng.normal(size=(E, D)).astype(np.float32)
    ct[e_real:] = 0.0                        # padding edges carry zero cotangent

    def f_rp(n):
        return (take_rows(n, jnp.asarray(ids.astype(np.int32)), True,
                          jnp.asarray(row_ptr)) * ct).sum()

    def f_scatter(n):
        return (take_rows(n, jnp.asarray(ids.astype(np.int32)), True) * ct).sum()

    g1 = np.asarray(jax.grad(f_rp)(jnp.asarray(nodes)))
    g2 = np.asarray(jax.grad(f_scatter)(jnp.asarray(nodes)))
    np.testing.assert_allclose(g1, g2, rtol=2e-5, atol=2e-5)


def test_take_rows_perm_backward_matches_scatter(rng):
    """Sender-gather backward via CSC perm + sorted_segment_sum == scatter."""
    from infomax3d_tpu.ops.segment import take_rows
    import jax

    E, N, D = 300, 67, 16
    senders = rng.integers(0, N, size=E - 40)
    senders = np.concatenate([senders, np.full(40, N)])  # padding edges
    perm = np.argsort(senders, kind="stable").astype(np.int32)
    row_ptr = np.zeros(N + 1, np.int32)
    row_ptr[1:] = np.cumsum(np.bincount(senders[senders < N], minlength=N))
    nodes = rng.normal(size=(N, D)).astype(np.float32)
    ct = rng.normal(size=(E, D)).astype(np.float32)
    ct[-40:] = 0.0
    ids = jnp.asarray(senders.astype(np.int32))

    def f_csc(n):
        return (take_rows(n, ids, False, jnp.asarray(row_ptr),
                          jnp.asarray(perm)) * ct).sum()

    def f_scatter(n):
        return (take_rows(n, ids) * ct).sum()

    g1 = np.asarray(jax.grad(f_csc)(jnp.asarray(nodes)))
    g2 = np.asarray(jax.grad(f_scatter)(jnp.asarray(nodes)))
    np.testing.assert_allclose(g1, g2, rtol=2e-5, atol=2e-5)


def test_dense_readout_matches_segment(rng):
    """Dense-regroup readout (BucketSpec.nmax) == segment readout, values and
    gradients."""
    import jax
    from infomax3d_tpu.graphs.batch import BucketSpec, batch_graphs, to_graph_batch
    from infomax3d_tpu.ops.segment import batch_readout, graph_readout

    graphs = []
    for _ in range(6):
        n = int(rng.integers(2, 9))
        e = int(rng.integers(1, 2 * n))
        graphs.append({
            "node_feat": rng.integers(0, 5, size=(n, 3)).astype(np.int32),
            "senders": rng.integers(0, n, size=e).astype(np.int32),
            "receivers": rng.integers(0, n, size=e).astype(np.int32),
        })
    bucket = BucketSpec(8, 64, 64, nmax=16)
    g = to_graph_batch(batch_graphs(graphs, bucket))
    assert "rd_node_idx" in g.extras and "rd_inv_flat" in g.extras

    h = jnp.asarray(rng.normal(size=(64, 12)).astype(np.float32))
    aggs = ["min", "max", "mean", "sum"]
    ref = graph_readout(h, g.node_graph, g.num_graphs, aggs)
    out = batch_readout(g, h, aggs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)

    w = jnp.asarray(rng.normal(size=(8, 48)).astype(np.float32))
    g_ref = jax.grad(lambda x: (graph_readout(
        x, g.node_graph, g.num_graphs, aggs) * w).sum())(h)
    g_out = jax.grad(lambda x: (batch_readout(g, x, aggs) * w).sum())(h)
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)

"""Data-parallel flagship bench: edges/s over an n-shard `data` mesh.

Used by tools/bench_2host.sh rungs 2 and 3 (full host / 2 hosts).  Keeps the
single-chip bench's architecture and PER-CHIP batch (weak scaling, the
convention behind BASELINE.md's >=90% 2-host edges/s target): global batch
= 500 * n_shards, NT-Xent sees the global batch through CrossDeviceLoss.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_dp_bench(n_shards: int, per_chip_batch: int = 500,
                 n_iter: int = 30) -> dict:
    import jax

    from infomax3d_tpu.data.loader import GraphDataLoader
    from infomax3d_tpu.data.synthetic import SyntheticMolecules
    from infomax3d_tpu.graphs.batch import BucketSpec
    from infomax3d_tpu.losses import LOSS_REGISTRY
    from infomax3d_tpu.models import PNA, Net3D
    from infomax3d_tpu.parallel import make_mesh
    from infomax3d_tpu.train.trainer import SelfSupervisedTrainer
    from infomax3d_tpu.utils.setup import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    mesh = make_mesh(n_shards)
    B = per_chip_batch * n_shards

    pna = PNA(hidden_dim=200, target_dim=256,
              aggregators=["mean", "max", "min", "std"],
              scalers=["identity", "amplification", "attenuation"],
              readout_aggregators=["min", "max", "mean"],
              mid_batch_norm=True, last_batch_norm=True,
              readout_batchnorm=True, batch_norm_momentum=0.93,
              readout_hidden_dim=200, propagation_depth=7, readout_layers=2,
              pretrans_layers=2, posttrans_layers=1)
    net3d = Net3D(hidden_dim=20, target_dim=256,
                  readout_aggregators=["min", "max", "mean"],
                  batch_norm=True, readout_batchnorm=True,
                  batch_norm_momentum=0.93, readout_hidden_dim=20,
                  node_wise_output_layers=0, message_net_layers=1,
                  update_net_layers=1, reduce_func="mean",
                  fourier_encodings=4, propagation_depth=1, readout_layers=1)

    ds = SyntheticMolecules(B, seed=0, n_min=10, n_max=26)

    class DS:
        def __len__(self):
            return B

        def __getitem__(self, i):
            return {"graph2d": ds.graph2d(i), "graph3d": ds.graph3d(i)}

    mols2 = [ds.graph2d(i) for i in range(B)]
    e2 = sum(m["senders"].shape[0] for m in mols2)
    e3 = sum(m["node_feat"].shape[0] * (m["node_feat"].shape[0] - 1)
             for m in mols2)
    n_tot = sum(m["node_feat"].shape[0] for m in mols2)
    maxdeg = max(int(np.bincount(m["receivers"]).max()) for m in mols2)
    # GLOBAL buckets: GraphDataLoader divides them by n_shards per shard —
    # size for the LARGEST contiguous shard slice (shuffle=False)
    per = per_chip_batch
    sh_n = max(sum(m["node_feat"].shape[0]
                   for m in mols2[i * per:(i + 1) * per])
               for i in range(n_shards))
    sh_e2 = max(sum(m["senders"].shape[0]
                    for m in mols2[i * per:(i + 1) * per])
                for i in range(n_shards))
    sh_e3 = max(sum(m["node_feat"].shape[0] * (m["node_feat"].shape[0] - 1)
                    for m in mols2[i * per:(i + 1) * per])
                for i in range(n_shards))
    n_pad = ((sh_n + 255) // 256) * 256 * n_shards
    e2_pad = ((sh_e2 + 511) // 512) * 512 * n_shards
    e3_pad = ((sh_e3 + 511) // 512) * 512 * n_shards
    b2 = BucketSpec(B, n_pad, e2_pad, max_deg=maxdeg, csr=True,
                    nmax=max(m["node_feat"].shape[0] for m in mols2))
    b3 = BucketSpec(B, n_pad, e3_pad)
    loader = GraphDataLoader(DS(), B, "contrastive_collate", bucket=b2,
                             n_shards=n_shards, prefetch=0, shuffle=False,
                             collate_kwargs={"bucket3d": b3})

    args = dict(num_epochs=1, patience=5, minimum_epochs=0,
                log_iterations=-1, val_per_batch=True, optimizer="Adam",
                optimizer_params={"lr": 8e-5}, lr_scheduler=None,
                transfer_layers=[], frozen_layers=[],
                exclude_from_transfer=[], models_to_save=[], checkpoint=None)
    tr = SelfSupervisedTrainer(
        {"model": pna, "model3d": net3d}, args, metrics={},
        main_metric="loss", run_dir="/tmp/bench_dp",
        loss_func=LOSS_REGISTRY["NTXent"](tau=0.1), loss_name="NTXent",
        mesh=mesh, use_tensorboard=False)

    batch = next(iter(loader))
    tr.init_state(tr.single_shard(batch))
    step, _ = tr._steps_for(batch)
    rng = jax.random.key(0)
    lrs = tr._full_lr_vector()

    # slope timing (same methodology as bench.py, VERDICT r4): two
    # iteration counts each bracketed by a REAL value fetch — on remote
    # backends block_until_ready can return before the device finishes,
    # and the fetch/RTT constant cancels in the difference
    state, loss, _ = step(tr.state, batch, lrs, rng)
    _ = float(jax.device_get(loss))

    def run(n):
        nonlocal state
        t0 = time.perf_counter()
        loss = None
        for _ in range(n):
            state, loss, _ = step(state, batch, lrs, rng)
        _ = float(jax.device_get(loss))
        return time.perf_counter() - t0

    n1, n2 = max(n_iter // 5, 5), n_iter + max(n_iter // 5, 5)
    dt = (run(n2) - run(n1)) / (n2 - n1)
    return {"edges_per_s": round((e2 + e3) / dt, 1),
            "step_ms": round(dt * 1e3, 2),
            "timing_method": f"slope(n1={n1},n2={n2},value-fetch)",
            "global_batch": B}


if __name__ == "__main__":
    import json
    import jax

    print(json.dumps(run_dp_bench(jax.device_count())))

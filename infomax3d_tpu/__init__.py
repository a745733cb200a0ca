"""infomax3d_tpu — a TPU-native re-design of 3D Infomax (HannesStark/3DInfomax).

Pre-trains 2D molecular GNNs against 3D-geometry encoders with contrastive
losses, then fine-tunes on molecular property prediction — built from scratch
for TPU: JAX/XLA for the compute graph, Pallas kernels for the hot
gather/scatter paths, `jax.sharding`/`shard_map` for scale-out.

Package map (reference capability -> here):
  graphs/    padded-CSR GraphBatch + bucketed host batcher (replaces DGL batch/collate)
  ops/       segment reduce / SDDMM / readout (XLA + Pallas), Fourier encodings
  models/    PNA, Net3D, GIN, EGNN, SAN, ... (replaces models/*.py)
  losses/    NTXent family and the full contrastive loss zoo (commons/losses.py)
  data/      flat-array dataset cache, featurizers, synthetic molecules
  train/     trainers, schedulers, metrics, checkpointing (trainer/*.py)
  parallel/  mesh setup, data-parallel pjit steps, cross-device NT-Xent
  cli/       train/inference entry points honoring the reference YAML schema

Note: the reference project name "3DInfomax" starts with a digit, which is not
a valid Python identifier, so the importable package is `infomax3d_tpu`.
"""

__version__ = "0.1.0"

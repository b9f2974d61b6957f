"""gptst_tpu — TPU-native spatio-temporal GNN framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
HKUDS/GPT-ST (NeurIPS 2023): masked-autoencoder pretraining of
spatio-temporal graph neural networks, plus the full downstream
predictor zoo (STGCN, GWN, TGCN, MTGNN, ASTGCN, STSGCN, STFGNN,
STGODE, ST-WA, MSDR, CCRNN, STMGCN, DMVSTNET).

Design: functional models (flax.linen), (B, T, N, D) tensor layout,
lax.scan recurrences, Pallas SpMM kernels for sparse aggregation,
and jax.sharding meshes for data/graph parallelism.
"""

__version__ = "0.1.0"

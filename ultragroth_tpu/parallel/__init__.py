"""Multi-chip execution: mesh-sharded MSM and NTT.

The reference is single-process shared-memory only (OpenMP + ThreadPool,
SURVEY.md section 2.12); this package is the TPU-native scaling dimension:
`jax.sharding.Mesh` + `shard_map`, with XLA collectives over ICI.
"""

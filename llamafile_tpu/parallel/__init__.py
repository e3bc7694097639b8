"""Parallelism: device meshes, tensor/data/expert sharding (SURVEY.md §2.10).

The reference's only intra-op parallelism is its pthread pool splitting each
ggml op by thread index (llamafile/pool.cpp:98-160, sgemm ith/nth args); here
the equivalents are SPMD: a jax.sharding.Mesh with named axes, shard_map'd
forwards, and XLA collectives over ICI.
"""

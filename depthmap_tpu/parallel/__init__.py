"""Multi-chip parallelism: device-mesh construction, sharding policies, and
the sharded training/inference steps.

The reference's only distributed code is vestigial NCCL DDP (SURVEY.md §2.4);
here data/tensor parallelism over a `jax.sharding.Mesh` is a first-class
feature: batch/frames ride the `data` axis, attention heads and MLP widths
ride the `model` axis.
"""

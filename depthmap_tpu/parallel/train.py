"""Sharded fine-tuning step for the depth models.

The reference ships (vestigial, unrunnable) NCCL DDP trainers with SILog +
gradient losses (dzoedepth/trainers/loss.py:42-135); here the same losses
drive a real pjit-sharded train step: batch on the `data` mesh axis (DP),
attention/MLP weights on the `model` axis (TP), with XLA inserting the
collectives.
"""
from __future__ import annotations

import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from depthmap_tpu.parallel.mesh import tree_pspecs


def silog_loss(pred: jax.Array, target: jax.Array, beta: float = 0.15,
               eps: float = 1e-6) -> jax.Array:
    """Scale-invariant log loss (reference dzoedepth/trainers/loss.py:42).
    torch.var defaults to the unbiased (ddof=1) estimator — match it."""
    g = jnp.log(pred + eps) - jnp.log(target + eps)
    dg = jnp.var(g, ddof=1) + beta * jnp.mean(g) ** 2
    return 10.0 * jnp.sqrt(dg)


def grad_l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Gradient-matching L1 loss (reference dzoedepth/trainers/loss.py:110)."""
    def grads(x):
        gy = x[:, 1:, :] - x[:, :-1, :]
        gx = x[:, :, 1:] - x[:, :, :-1]
        return gy, gx
    py, px = grads(pred)
    ty, tx = grads(target)
    return jnp.mean(jnp.abs(py - ty)) + jnp.mean(jnp.abs(px - tx))


def make_train_step(model, optimizer, mesh: Mesh):
    """Returns (init_state, train_step) with shardings over `mesh`.

    The step is jit-compiled with explicit in/out shardings: params/opt-state
    follow the tensor-parallel policy (parallel/mesh.py), batches are split
    on the data axis.
    """
    def loss_fn(params, batch):
        images, targets = batch
        pred = model.apply(params, images, train=False)
        return silog_loss(nn_relu_eps(pred), targets) + \
            0.1 * grad_l1_loss(pred, targets)

    def nn_relu_eps(x):
        return jnp.maximum(x, 0.0) + 1e-3

    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def shard_and_jit(params):
        pspecs = tree_pspecs(params)
        param_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                                is_leaf=lambda x: isinstance(x, P))
        batch_sh = (NamedSharding(mesh, P("data")),
                    NamedSharding(mesh, P("data")))
        params = jax.device_put(params, param_sh)
        opt_state = jax.jit(
            optimizer.init, out_shardings=None)(params)
        step = jax.jit(train_step,
                       in_shardings=(param_sh, None, batch_sh),
                       out_shardings=(param_sh, None, None),
                       donate_argnums=(0, 1))
        return params, opt_state, step

    return shard_and_jit

"""Data-parallel surrogate training: batch axis sharded over the device mesh.

The reference trains on a single GPU with PyG mini-batches (train_gnn.py:150-152);
tpufem shards the stacked padded-graph batch over a 1-D device mesh and jits the
whole step — XLA turns the gradient mean into a psum over ICI. Works identically
on the virtual 8-device CPU mesh (tests / dryrun) and a real pod slice.
"""

from __future__ import annotations

from typing import Callable

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpufem.models.sage import GraphSAGE
from tpufem.models.metrics import masked_mse
from tpufem.models.train import GraphBatchArrays


def make_dp_train_step(
    model: GraphSAGE,
    opt: optax.GradientTransformation,
    mesh: Mesh,
    axis: str = "mesh",
) -> Callable:
    """Returns jitted (params, opt_state, batch, rng) -> (params, opt_state, loss)
    with `batch` sharded over its leading axis and params replicated."""
    batch_sh = NamedSharding(mesh, P(axis))
    repl_sh = NamedSharding(mesh, P())

    def loss_fn(params, batch: GraphBatchArrays, rng):
        def per_graph(x, ei, em, y, lm, r):
            pred = model.apply(
                params, x, ei, em, deterministic=False, rngs={"dropout": r}
            )
            return masked_mse(pred, y, lm)

        rngs = jax.random.split(rng, batch.x.shape[0])
        losses = jax.vmap(per_graph)(
            batch.x, batch.edge_index, batch.edge_mask, batch.y, batch.loss_mask, rngs
        )
        return losses.mean()

    def step(params, opt_state, batch: GraphBatchArrays, rng):
        batch = jax.tree.map(
            lambda a: jax.lax.with_sharding_constraint(
                a, NamedSharding(mesh, P(axis, *([None] * (a.ndim - 1))))
            ),
            batch,
        )
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(
        step,
        in_shardings=(repl_sh, repl_sh, batch_sh, repl_sh),
        out_shardings=(repl_sh, repl_sh, repl_sh),
    )


def shard_batch(batch: GraphBatchArrays, mesh: Mesh, axis: str = "mesh") -> GraphBatchArrays:
    """Place a stacked graph batch with its leading axis sharded over the mesh."""
    def put(a):
        spec = P(axis, *([None] * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)

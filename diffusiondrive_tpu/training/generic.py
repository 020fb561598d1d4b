"""Generic training loop for simple (non-transfuser) agents.

Parity: the reference trains ANY AbstractAgent through
`AgentLightningModule` (`agent_lightning_module.py:9-58`) — forward on the
feature dict, `agent.compute_loss`, agent-provided optimizer. This module
gives the same genericity for Flax-backed agents like EgoStatusMLP: the agent
supplies `model`, `variables`, an optax transformation, and a loss over
(features, targets, predictions).
"""

from __future__ import annotations

import logging
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

logger = logging.getLogger(__name__)


def make_generic_train_step(model, loss_fn: Callable, tx: optax.GradientTransformation,
                            feature_keys: Tuple[str, ...]):
    """Jitted step for agents whose model maps one feature tensor-dict to a
    prediction dict: (variables, opt_state, batch) -> updated + loss."""

    @jax.jit
    def step(params, opt_state, batch):
        features = {k: batch[k] for k in feature_keys}
        targets = {k: v for k, v in batch.items() if k not in feature_keys}

        def compute(p):
            preds = model.apply(p, *[features[k] for k in feature_keys])
            if not isinstance(preds, dict):
                preds = {"trajectory": preds}
            return loss_fn(features, targets, preds)

        loss, grads = jax.value_and_grad(compute)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def train_agent(agent, dataset, batch_size: int, num_epochs: int, seed: int = 0,
                log_every: int = 50):
    """Train a simple Flax agent (e.g. EgoStatusMLPAgent) from a Dataset."""
    from diffusiondrive_tpu.training.dataset import batch_iterator

    agent.initialize()
    tx = agent.get_optimizers()
    params = agent.variables
    opt_state = tx.init(params)

    features0, _ = dataset[0]
    feature_keys = tuple(features0.keys())
    step = make_generic_train_step(agent.model, agent.compute_loss, tx, feature_keys)

    for epoch in range(num_epochs):
        losses = []
        for count, batch in enumerate(batch_iterator(dataset, batch_size, seed=seed + epoch)):
            params, opt_state, loss = step(params, opt_state, batch)
            losses.append(float(loss))
            if (count + 1) % log_every == 0:
                logger.info("epoch %d step %d loss %.4f", epoch, count + 1, losses[-1])
        logger.info("epoch %d mean loss %.4f", epoch, float(np.mean(losses)) if losses else float("nan"))

    agent.variables = params
    return agent

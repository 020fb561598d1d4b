"""Training losses for the Transfuser/DiffusionDrive family.

Parity:
- diffusion trajectory loss: `modules/multimodal_loss.py:119-168` —
  per cascade layer, nearest-anchor mode assignment, sigmoid focal loss on
  the 20-way mode classification, L1 on the best mode's poses.
- global loss: `transfuser_loss.py:12-113` — weighted sum of trajectory,
  Hungarian-matched detection (CE + L1) and BEV-semantic cross-entropy.

Everything is pure-JAX (the LAP included), so the full loss jits into the
train step with no host syncs.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from diffusiondrive_tpu.models.config import TransfuserConfig
from diffusiondrive_tpu.ops.hungarian import batched_linear_sum_assignment
from diffusiondrive_tpu.ops.sampling import onehot_take_rows


def sigmoid_focal_loss(
    logits: jnp.ndarray, targets: jnp.ndarray, gamma: float = 2.0, alpha: float = 0.25
) -> jnp.ndarray:
    """Element-wise sigmoid focal loss (`multimodal_loss.py:70-116`), mean-reduced."""
    p = jax.nn.sigmoid(logits)
    pt = (1.0 - p) * targets + p * (1.0 - targets)
    focal_weight = (alpha * targets + (1.0 - alpha) * (1.0 - targets)) * pt**gamma
    bce = optax.sigmoid_binary_cross_entropy(logits, targets)
    return jnp.mean(bce * focal_weight)


def single_layer_trajectory_loss(
    poses_reg: jnp.ndarray,    # (B, M, P, 3)
    poses_cls: jnp.ndarray,    # (B, M)
    target_traj: jnp.ndarray,  # (B, P, 3)
    plan_anchor: jnp.ndarray,  # (B, M, P, 2)
    config: TransfuserConfig,
) -> jnp.ndarray:
    """One cascade layer's loss (`multimodal_loss.py:128-168`)."""
    B, M = poses_cls.shape

    dist = jnp.linalg.norm(target_traj[:, None, :, :2] - plan_anchor, axis=-1).mean(axis=-1)  # (B, M)
    mode_idx = jnp.argmin(dist, axis=-1)  # (B,)

    onehot = jax.nn.one_hot(mode_idx, M, dtype=poses_cls.dtype)
    loss_cls = config.trajectory_cls_weight * sigmoid_focal_loss(poses_cls, onehot)

    best_reg = onehot_take_rows(poses_reg, mode_idx[:, None])[:, 0]
    loss_reg = config.trajectory_reg_weight * jnp.mean(jnp.abs(best_reg - target_traj))
    return loss_cls + loss_reg


def diffusion_trajectory_loss(
    predictions: Dict[str, jnp.ndarray], targets: Dict[str, jnp.ndarray], config: TransfuserConfig
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Summed per-layer cascade loss (`transfuser_model_v2.py:559-566`)."""
    target_traj = targets["trajectory"]
    regs = predictions["poses_reg_layers"]  # (L, B, M, P, 3)
    clss = predictions["poses_cls_layers"]  # (L, B, M)
    anchors = predictions["plan_anchor"]    # (B, M, P, 2)

    total = jnp.float32(0.0)
    loss_dict = {}
    for layer in range(regs.shape[0]):
        layer_loss = single_layer_trajectory_loss(regs[layer], clss[layer], target_traj, anchors, config)
        loss_dict[f"trajectory_loss_{layer}"] = layer_loss
        total = total + layer_loss
    return total, loss_dict


def _ce_cost(gt_valid: jnp.ndarray, pred_logits: jnp.ndarray) -> jnp.ndarray:
    """(B, n_pred, n_gt) BCE-with-logits cost (`transfuser_loss.py:116-138`)."""
    gt = gt_valid[:, None, :].astype(jnp.float32)    # (B, 1, n_gt)
    logits = pred_logits[:, :, None]                 # (B, n_pred, 1)
    max_val = jax.nn.relu(-logits)
    helper = max_val + jnp.log(jnp.exp(-max_val) + jnp.exp(-logits - max_val))
    return (1.0 - gt) * logits + helper


def _l1_cost(gt_states: jnp.ndarray, pred_states: jnp.ndarray, gt_valid: jnp.ndarray) -> jnp.ndarray:
    """(B, n_pred, n_gt) center-distance cost (`transfuser_loss.py:141-157`)."""
    diff = jnp.abs(gt_states[:, None, :, :2] - pred_states[:, :, None, :2]).sum(-1)  # (B, n_pred, n_gt)
    return gt_valid[:, None, :].astype(jnp.float32) * diff


def agent_detection_loss(
    targets: Dict[str, jnp.ndarray], predictions: Dict[str, jnp.ndarray], config: TransfuserConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hungarian-matched detection loss (`transfuser_loss.py:54-113`)."""
    gt_states = targets["agent_states"].astype(jnp.float32)    # (B, N, 5)
    gt_valid = targets["agent_labels"].astype(jnp.float32)     # (B, N)
    pred_states = predictions["agent_states"]                  # (B, N, 5)
    pred_logits = predictions["agent_labels"]                  # (B, N)

    B, N = gt_valid.shape
    num_gt = jnp.maximum(gt_valid.sum(), 1.0)

    cost = jax.lax.stop_gradient(
        config.agent_class_weight * _ce_cost(gt_valid, pred_logits)
        + config.agent_box_weight * _l1_cost(gt_states, pred_states, gt_valid)
    )
    # cols[b, i] = gt index matched to prediction i
    cols = batched_linear_sum_assignment(cost)

    gt_states_m = onehot_take_rows(gt_states, cols)
    gt_valid_m = onehot_take_rows(gt_valid[..., None], cols)[..., 0]

    l1 = jnp.abs(pred_states - gt_states_m).sum(-1) * gt_valid_m
    l1_loss = l1.sum() / num_gt

    ce_loss = optax.sigmoid_binary_cross_entropy(pred_logits, gt_valid_m).mean()
    return ce_loss, l1_loss


def bev_semantic_loss(predictions: Dict[str, jnp.ndarray], targets: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Cross-entropy over the (B, H, W, C) class-last semantic map.

    Same math as `optax.softmax_cross_entropy_with_integer_labels`, but the
    label logit is picked with a one-hot contraction instead of optax's
    `take_along_axis`: on TPU that gather over the (B,128,256,7) map (and its
    scatter transpose in the backward pass) was the single `gather` fusion
    costing 3.87 ms/step — 13.6% of the whole device step (round-4 trace)."""
    logits = predictions["bev_semantic_map"].astype(jnp.float32)
    labels = targets["bev_semantic_map"].astype(jnp.int32)
    lse = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.sum(jax.nn.one_hot(labels, logits.shape[-1], dtype=logits.dtype) * logits, axis=-1)
    return (lse - picked).mean()


def transfuser_loss(
    targets: Dict[str, jnp.ndarray], predictions: Dict[str, jnp.ndarray], config: TransfuserConfig
) -> Dict[str, jnp.ndarray]:
    """Combined loss dict (`transfuser_loss.py:12-51`).

    Predictions are upcast to fp32 on entry: under bf16-mixed training
    (reference default `precision: 16-mixed`, `default_training.yaml:43`) the
    model computes in bf16 but the loss — log/exp/focal terms and the final
    accumulation — must run fp32 or small loss components round away.
    """
    predictions = {
        k: v.astype(jnp.float32) if jnp.issubdtype(v.dtype, jnp.floating) else v
        for k, v in predictions.items()
    }
    if "poses_reg_layers" in predictions:
        trajectory_loss, traj_dict = diffusion_trajectory_loss(predictions, targets, config)
    else:
        trajectory_loss = jnp.mean(jnp.abs(predictions["trajectory"] - targets["trajectory"]))
        traj_dict = {}

    agent_class_loss, agent_box_loss = agent_detection_loss(targets, predictions, config)
    bev_loss = bev_semantic_loss(predictions, targets)

    loss = (
        config.trajectory_weight * trajectory_loss
        + config.agent_class_weight * agent_class_loss
        + config.agent_box_weight * agent_box_loss
        + config.bev_semantic_weight * bev_loss
    )
    loss_dict = {
        "loss": loss,
        "trajectory_loss": config.trajectory_weight * trajectory_loss,
        "agent_class_loss": config.agent_class_weight * agent_class_loss,
        "agent_box_loss": config.agent_box_weight * agent_box_loss,
        "bev_semantic_loss": config.bev_semantic_weight * bev_loss,
    }
    loss_dict.update(traj_dict)
    return loss_dict

"""Numerical weight-port parity: torch forward twin vs ported Flax model.

Extends the structural test in `test_port_transfuser.py` with *forward logic*:
an independently-written torch implementation of the V2 model (standard
`nn.Conv2d`/`nn.MultiheadAttention`/`F.grid_sample`/BN modules composed to
this framework's documented semantics), run with random weights. Those same
weights are converted by `port_transfuser_checkpoint` and the Flax forward
must reproduce the torch outputs within fp32 tolerance — block by block
(backbone, decoder, heads) and end to end through the truncated 2-step DDIM
rollout. This is the insurance policy for loading the published checkpoint
(`navsim/agents/diffusiondrive/transfuser_model_v2.py:19-205`,
`transfuser_backbone.py:16-277`): one wrong transpose or BN convention and
these asserts fail.
"""

import math

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from diffusiondrive_tpu.models.transfuser_model import DiffusionDriveModel
from diffusiondrive_tpu.utils.port_transfuser import port_transfuser_checkpoint

from test_train import CAM_H, CAM_W, LID, tiny_config
from test_port_transfuser import build_torch_skeleton

# Ego-frame trajectory normalization box (x in [-1.2, 55.7], y in [-20, 26],
# heading in [-2, 1.9]) — the published model's diffusion space.
_OFF = np.array([1.2, 20.0, 2.0], dtype=np.float32)
_SCALE = np.array([56.9, 46.0, 3.9], dtype=np.float32)


def t_norm_odo(x):
    d = x.shape[-1]
    return 2.0 * (x + torch.from_numpy(_OFF[:d])) / torch.from_numpy(_SCALE[:d]) - 1.0


def t_denorm_odo(x):
    d = x.shape[-1]
    return (x + 1.0) / 2.0 * torch.from_numpy(_SCALE[:d]) - torch.from_numpy(_OFF[:d])


# --------------------------------------------------------------------------- #
# DDIM math (scaled-linear betas, sample prediction, eta=0), written fresh
# --------------------------------------------------------------------------- #

_ALPHAS_CUMPROD = np.cumprod(
    1.0 - np.linspace(1e-4 ** 0.5, 0.02 ** 0.5, 1000, dtype=np.float64) ** 2
).astype(np.float32)


def t_add_noise(x0, noise, t: int):
    a = float(_ALPHAS_CUMPROD[t])
    return math.sqrt(a) * x0 + math.sqrt(1.0 - a) * noise


def t_ddim_step(x_start, t: int, sample):
    """One eta=0 DDIM step with step ratio 1 (prev = t - 1)."""
    a_t = float(_ALPHAS_CUMPROD[t])
    a_prev = float(_ALPHAS_CUMPROD[t - 1]) if t - 1 >= 0 else 1.0
    x_start = torch.clamp(x_start, -1.0, 1.0)
    eps = (sample - math.sqrt(a_t) * x_start) / math.sqrt(1.0 - a_t)
    return math.sqrt(a_prev) * x_start + math.sqrt(1.0 - a_prev) * eps


# --------------------------------------------------------------------------- #
# Embeddings (DAB-DETR sine embed; classic timestep embed), written fresh
# --------------------------------------------------------------------------- #


def t_sineembed(pos, hidden_dim=64):
    """(..., 2) points -> (..., hidden_dim) = [y-embed | x-embed]."""
    half = hidden_dim // 2
    dim_t = torch.from_numpy(
        (10000.0 ** (2.0 * (np.arange(half) // 2) / half)).astype(np.float32)
    )
    scale = 2.0 * math.pi

    def embed(coord):
        p = (coord * scale).unsqueeze(-1) / dim_t
        out = torch.stack([p[..., 0::2].sin(), p[..., 1::2].cos()], dim=-1)
        return out.reshape(*p.shape[:-1], half)

    return torch.cat([embed(pos[..., 1]), embed(pos[..., 0])], dim=-1)


def t_timestep_embed(t, dim):
    half = dim // 2
    freqs = torch.from_numpy(
        np.exp(np.arange(half) * -(math.log(10000.0) / (half - 1))).astype(np.float32)
    )
    args = t.float().unsqueeze(-1) * freqs
    return torch.cat([args.sin(), args.cos()], dim=-1)


# --------------------------------------------------------------------------- #
# Torch forward twin
# --------------------------------------------------------------------------- #


def resnet_stem(enc, x):
    return F.max_pool2d(F.relu(enc.bn1(enc.conv1(x))), 3, 2, 1)


def gpt_forward(g, tokens, n_head):
    x = tokens + g.pos_emb
    for b in g.blocks:
        h = b.ln1(x)
        B, T, C = h.shape
        dh = C // n_head

        def split(t):
            return t.view(B, T, n_head, dh).transpose(1, 2)

        q, k, v = split(b.attn.query(h)), split(b.attn.key(h)), split(b.attn.value(h))
        att = (q @ k.transpose(-2, -1)) / math.sqrt(dh)
        y = (att.softmax(-1) @ v).transpose(1, 2).reshape(B, T, C)
        x = x + b.attn.proj(y)
        x = x + b.mlp(b.ln2(x))
    return g.ln_f(x)


def backbone_forward(bb, cfg, camera, lidar):
    """-> (p3 upscale BEV (B,64,H,W), bev_feature (B,512,h,w)), NCHW."""
    img = resnet_stem(bb.image_encoder, camera)
    lid = resnet_stem(bb.lidar_encoder, lidar)
    n_img = cfg.img_vert_anchors * cfg.img_horz_anchors
    for i in range(4):
        img = getattr(bb.image_encoder, f"layer{i + 1}")(img)
        lid = getattr(bb.lidar_encoder, f"layer{i + 1}")(lid)

        img_tok = F.adaptive_avg_pool2d(img, (cfg.img_vert_anchors, cfg.img_horz_anchors))
        lid_tok = F.adaptive_avg_pool2d(lid, (cfg.lidar_vert_anchors, cfg.lidar_horz_anchors))
        lid_tok = bb.lidar_channel_to_img[i](lid_tok)

        B, C = img_tok.shape[:2]
        tokens = torch.cat(
            [img_tok.flatten(2).transpose(1, 2), lid_tok.flatten(2).transpose(1, 2)], dim=1
        )
        x = gpt_forward(bb.transformers[i], tokens, cfg.n_head)
        img_out = x[:, :n_img].transpose(1, 2).reshape(
            B, C, cfg.img_vert_anchors, cfg.img_horz_anchors)
        lid_out = x[:, n_img:].transpose(1, 2).reshape(
            B, C, cfg.lidar_vert_anchors, cfg.lidar_horz_anchors)
        lid_out = bb.img_channel_to_lidar[i](lid_out)

        img = img + F.interpolate(img_out, img.shape[2:], mode="bilinear", align_corners=False)
        lid = lid + F.interpolate(lid_out, lid.shape[2:], mode="bilinear", align_corners=False)

    bev_feature = lid
    p5 = F.relu(bb.c5_conv(bev_feature))
    p5 = F.interpolate(p5, scale_factor=cfg.bev_upsample_factor, mode="bilinear",
                       align_corners=False)
    p4 = F.relu(bb.up_conv5(p5))
    target = (cfg.lidar_resolution_height // cfg.bev_down_sample_factor,
              cfg.lidar_resolution_width // cfg.bev_down_sample_factor)
    p4 = F.interpolate(p4, target, mode="bilinear", align_corners=False)
    return F.relu(bb.up_conv4(p4)), bev_feature


def diff_layer_forward(l, cfg, traj_feature, points, bev_nchw, agents_q, ego_q, time_embed):
    """One cascade layer; `points` (B, M, P, 2) in ego meters."""
    gx = points[..., 1] / cfg.lidar_max_y
    gy = points[..., 0] / cfg.lidar_max_x
    grid = torch.stack([gx, gy], dim=-1)

    attention = l.cross_bev_attention.attention_weights(traj_feature).softmax(-1)  # (B,M,P)
    value = l.cross_bev_attention.value_proj(bev_nchw)  # conv3x3 + ReLU -> (B,256,H,W)
    sampled = F.grid_sample(value, grid, align_corners=False)  # (B,256,M,P)
    out = torch.einsum("bmp,bcmp->bmc", attention, sampled)
    x = l.cross_bev_attention.output_proj(out) + traj_feature

    aa, _ = l.cross_agent_attention(x, agents_q, agents_q)
    x = l.norm1(x + aa)
    ea, _ = l.cross_ego_attention(x, ego_q, ego_q)
    x = l.norm2(x + ea)
    x = l.norm3(l.ffn(x))  # FFN output replaces (not residual) — reference semantics

    scale, shift = l.time_modulation.scale_shift_mlp(time_embed).chunk(2, dim=-1)
    x = x * (1.0 + scale) + shift

    cls = l.task_decoder.plan_cls_branch(x)[..., 0]
    B, M, _ = x.shape
    reg = l.task_decoder.plan_reg_branch(x).reshape(B, M, cfg.num_poses, 3)
    xy = reg[..., :2] + points
    heading = torch.tanh(reg[..., 2:3]) * math.pi
    return torch.cat([xy, heading], dim=-1), cls


def trajectory_head_test(th, cfg, ego_q, agents_q, cross_bev_nchw, noise):
    B = ego_q.shape[0]
    anchors = th.plan_anchor.unsqueeze(0).expand(B, -1, -1, -1)
    img = t_add_noise(t_norm_odo(anchors), noise, cfg.diffusion_test_trunc_t)

    ratio = cfg.diffusion_test_span / cfg.diffusion_test_steps
    roll = [int(t) for t in np.round(np.arange(cfg.diffusion_test_steps) * ratio)[::-1]]
    poses_reg = poses_cls = None
    for k in roll:
        points = t_denorm_odo(torch.clamp(img, -1.0, 1.0))
        Bp, M, P, _ = points.shape
        pos = t_sineembed(points, 64).reshape(Bp, M, P * 64)
        traj_feature = th.plan_anchor_encoder(pos)
        time_embed = th.time_mlp(
            t_timestep_embed(torch.full((B,), k, dtype=torch.long), cfg.tf_d_model)
        ).unsqueeze(1)
        pts = points
        for l in th.diff_decoder.layers:
            poses_reg, poses_cls = diff_layer_forward(
                l, cfg, traj_feature, pts, cross_bev_nchw, agents_q, ego_q, time_embed)
            pts = poses_reg[..., :2].detach()
        img = t_ddim_step(t_norm_odo(poses_reg[..., :2]), k, img)

    mode = poses_cls.argmax(dim=-1)
    best = poses_reg[torch.arange(B), mode]
    return best, poses_reg, poses_cls


def torch_model_forward(root, cfg, camera, lidar, status, noise):
    """Full eval-path forward of the torch twin. NCHW inputs."""
    p3, bev_feature = backbone_forward(root._backbone, cfg, camera, lidar)
    B = status.shape[0]
    d = cfg.tf_d_model

    bev_tokens = root._bev_downscale(bev_feature).flatten(2).transpose(1, 2)
    status_enc = root._status_encoding(status)
    keyval = torch.cat([bev_tokens, status_enc.unsqueeze(1)], dim=1)
    keyval = keyval + root._keyval_embedding.weight.unsqueeze(0)

    bh, bw = bev_feature.shape[2:]
    keyval_bev = keyval[:, :-1].transpose(1, 2).reshape(B, d, bh, bw)
    keyval_bev = F.interpolate(keyval_bev, p3.shape[2:], mode="bilinear", align_corners=False)
    cross_bev = torch.cat([keyval_bev, p3], dim=1).permute(0, 2, 3, 1)
    cross_bev = root.bev_proj(cross_bev).permute(0, 3, 1, 2)  # back to NCHW for grid_sample

    x = root._query_embedding.weight.unsqueeze(0).expand(B, -1, -1)
    for l in root._tf_decoder.layers:
        sa, _ = l.self_attn(x, x, x)
        x = l.norm1(x + sa)
        ca, _ = l.multihead_attn(x, keyval, keyval)
        x = l.norm2(x + ca)
        x = l.norm3(x + l.linear2(F.relu(l.linear1(x))))
    ego_q, agents_q = x[:, :1], x[:, 1:]

    sem = root._bev_semantic_head(p3)
    bev_semantic = F.interpolate(sem, cfg.bev_semantic_frame, mode="bilinear",
                                 align_corners=False)

    states = root._agent_head._mlp_states(agents_q)
    xy = torch.tanh(states[..., :2]) * 32.0
    heading = torch.tanh(states[..., 2:3]) * math.pi
    agent_states = torch.cat([xy, heading, states[..., 3:]], dim=-1)
    agent_labels = root._agent_head._mlp_label(agents_q)[..., 0]

    trajectory, poses_reg, poses_cls = trajectory_head_test(
        root._trajectory_head, cfg, ego_q, agents_q, cross_bev, noise)

    return {
        "trajectory": trajectory,
        "poses_reg": poses_reg,
        "poses_cls": poses_cls,
        "bev_semantic_map": bev_semantic,
        "agent_states": agent_states,
        "agent_labels": agent_labels,
    }


# --------------------------------------------------------------------------- #
# The parity test
# --------------------------------------------------------------------------- #


def test_torch_forward_parity_end_to_end():
    cfg = tiny_config()
    torch.manual_seed(42)
    root = build_torch_skeleton(cfg).eval()
    with torch.no_grad():
        # randomize BN running stats so stat-porting errors surface
        for m in root.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.7, 1.5)
        # the skeleton's anchors must live inside the normalization box
        root._trajectory_head.plan_anchor.copy_(
            torch.from_numpy(
                np.stack(
                    np.meshgrid(np.linspace(2, 50, cfg.ego_fut_mode), np.arange(cfg.num_poses),
                                indexing="ij"),
                    axis=-1,
                ).astype(np.float32)
                * np.array([1.0, 0.0], np.float32)
                + np.linspace(-15, 15, cfg.ego_fut_mode)[:, None, None]
                * np.array([0.0, 1.0], np.float32)
                * np.linspace(0, 1, cfg.num_poses)[None, :, None]
            )
        )

    rng = np.random.default_rng(7)
    camera = rng.uniform(size=(2, CAM_H, CAM_W, 3)).astype(np.float32)
    lidar = rng.uniform(size=(2, LID, LID, 1)).astype(np.float32)
    status = rng.normal(size=(2, 8)).astype(np.float32)
    noise = rng.normal(size=(2, cfg.ego_fut_mode, cfg.num_poses, 2)).astype(np.float32)

    with torch.no_grad():
        ref = torch_model_forward(
            root, cfg,
            torch.from_numpy(camera).permute(0, 3, 1, 2),
            torch.from_numpy(lidar).permute(0, 3, 1, 2),
            torch.from_numpy(status),
            torch.from_numpy(noise),
        )

    variables = port_transfuser_checkpoint(root.state_dict(), cfg)
    model = DiffusionDriveModel(cfg)
    out = jax.jit(lambda c, l, s, n: model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"],
         "constants": variables["constants"]},
        c, l, s, diffusion_noise=n,
    ))(jnp.asarray(camera), jnp.asarray(lidar), jnp.asarray(status), jnp.asarray(noise))

    def check(name, ours, theirs, atol, nchw=False):
        theirs = theirs.numpy()
        if nchw:
            theirs = np.transpose(theirs, (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=atol, rtol=1e-4,
                                   err_msg=name)

    check("bev_semantic_map", out["bev_semantic_map"], ref["bev_semantic_map"], 2e-4, nchw=True)
    check("agent_states", out["agent_states"], ref["agent_states"], 2e-4)
    check("agent_labels", out["agent_labels"], ref["agent_labels"], 2e-4)
    check("poses_cls", out["poses_cls"], ref["poses_cls"], 5e-4)
    check("poses_reg", out["poses_reg"], ref["poses_reg"], 1e-3)
    # the headline artifact: identical final trajectories
    check("trajectory", out["trajectory"], ref["trajectory"], 1e-3)
    # mode selection itself must agree
    assert (np.asarray(out["poses_cls"]).argmax(-1)
            == ref["poses_cls"].numpy().argmax(-1)).all()

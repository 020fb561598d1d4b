"""Full-checkpoint porting test.

Builds a torch module skeleton with the reference checkpoint's state-dict
layout (names + shapes only; no forward logic), converts it with
`port_transfuser_checkpoint`, and verifies the result is structurally
identical to the Flax model's own init tree and runs a forward pass.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from diffusiondrive_tpu.models.transfuser_model import DiffusionDriveModel
from diffusiondrive_tpu.utils.port_transfuser import port_transfuser_checkpoint

from test_train import CAM_H, CAM_W, LID, tiny_config
from test_port_weights import TorchBasicBlock


def torch_resnet18_trunk(in_ch=3):
    """timm-style resnet18 module dict (conv1/bn1/layer1..4)."""
    m = tnn.Module()
    m.conv1 = tnn.Conv2d(in_ch, 64, 7, 2, 3, bias=False)
    m.bn1 = tnn.BatchNorm2d(64)
    widths = [64, 128, 256, 512]
    cin = 64
    for i, w in enumerate(widths):
        blocks = [TorchBasicBlock(cin, w, 1 if i == 0 else 2), TorchBasicBlock(w, w)]
        setattr(m, f"layer{i + 1}", tnn.Sequential(*blocks))
        cin = w
    return m


def linear_relu_ln_torch(embed, in_loops, out_loops, input_dims=None):
    input_dims = input_dims or embed
    layers = []
    for _ in range(out_loops):
        for _ in range(in_loops):
            layers += [tnn.Linear(input_dims, embed), tnn.ReLU()]
            input_dims = embed
        layers.append(tnn.LayerNorm(embed))
    return layers


def build_torch_skeleton(cfg):
    """State-dict-compatible skeleton of V2TransfuserModel (tiny config)."""
    d = cfg.tf_d_model
    chs = [64, 128, 256, 512]
    root = tnn.Module()

    backbone = tnn.Module()
    backbone.image_encoder = torch_resnet18_trunk(3)
    backbone.lidar_encoder = torch_resnet18_trunk(1)

    def gpt(n_embd):
        g = tnn.Module()
        n_tokens = cfg.img_vert_anchors * cfg.img_horz_anchors + cfg.lidar_vert_anchors * cfg.lidar_horz_anchors
        g.pos_emb = tnn.Parameter(torch.zeros(1, n_tokens, n_embd))
        blocks = []
        for _ in range(cfg.n_layer):
            b = tnn.Module()
            b.ln1 = tnn.LayerNorm(n_embd)
            b.ln2 = tnn.LayerNorm(n_embd)
            attn = tnn.Module()
            attn.query = tnn.Linear(n_embd, n_embd)
            attn.key = tnn.Linear(n_embd, n_embd)
            attn.value = tnn.Linear(n_embd, n_embd)
            attn.proj = tnn.Linear(n_embd, n_embd)
            b.attn = attn
            b.mlp = tnn.Sequential(tnn.Linear(n_embd, cfg.block_exp * n_embd), tnn.ReLU(),
                                   tnn.Linear(cfg.block_exp * n_embd, n_embd))
            blocks.append(b)
        g.blocks = tnn.ModuleList(blocks)
        g.ln_f = tnn.LayerNorm(n_embd)
        return g

    backbone.transformers = tnn.ModuleList([gpt(chs[i]) for i in range(4)])
    backbone.lidar_channel_to_img = tnn.ModuleList([tnn.Conv2d(chs[i], chs[i], 1) for i in range(4)])
    backbone.img_channel_to_lidar = tnn.ModuleList([tnn.Conv2d(chs[i], chs[i], 1) for i in range(4)])
    ch = cfg.bev_features_channels
    backbone.c5_conv = tnn.Conv2d(512, ch, 1)
    backbone.up_conv5 = tnn.Conv2d(ch, ch, 3, padding=1)
    backbone.up_conv4 = tnn.Conv2d(ch, ch, 3, padding=1)
    root._backbone = backbone

    root._bev_downscale = tnn.Conv2d(512, d, 1)
    root._status_encoding = tnn.Linear(8, d)
    n_keyval = (LID // 32) * (LID // 32) + 1
    root._keyval_embedding = tnn.Embedding(n_keyval, d)
    root._query_embedding = tnn.Embedding(1 + cfg.num_bounding_boxes, d)
    root.bev_proj = tnn.Sequential(*linear_relu_ln_torch(d, 1, 1, d + ch))
    root._bev_semantic_head = tnn.Sequential(
        tnn.Conv2d(ch, ch, 3, padding=1), tnn.ReLU(), tnn.Conv2d(ch, cfg.num_bev_classes, 1)
    )

    dec_layer_names = []
    layers = []
    for _ in range(cfg.tf_num_layers):
        l = tnn.Module()
        l.self_attn = tnn.MultiheadAttention(d, cfg.tf_num_head, batch_first=True)
        l.multihead_attn = tnn.MultiheadAttention(d, cfg.tf_num_head, batch_first=True)
        l.linear1 = tnn.Linear(d, cfg.tf_d_ffn)
        l.linear2 = tnn.Linear(cfg.tf_d_ffn, d)
        l.norm1, l.norm2, l.norm3 = tnn.LayerNorm(d), tnn.LayerNorm(d), tnn.LayerNorm(d)
        layers.append(l)
    dec = tnn.Module()
    dec.layers = tnn.ModuleList(layers)
    root._tf_decoder = dec

    agent_head = tnn.Module()
    agent_head._mlp_states = tnn.Sequential(tnn.Linear(d, cfg.tf_d_ffn), tnn.ReLU(),
                                            tnn.Linear(cfg.tf_d_ffn, 5))
    agent_head._mlp_label = tnn.Sequential(tnn.Linear(d, 1))
    root._agent_head = agent_head

    th = tnn.Module()
    th.plan_anchor = tnn.Parameter(torch.randn(cfg.ego_fut_mode, cfg.num_poses, 2))
    th.plan_anchor_encoder = tnn.Sequential(
        *linear_relu_ln_torch(d, 1, 1, cfg.num_poses * 64), tnn.Linear(d, d)
    )
    th.time_mlp = tnn.Sequential(tnn.Identity(), tnn.Linear(d, d * 4), tnn.Mish(), tnn.Linear(d * 4, d))
    diff_layers = []
    for _ in range(cfg.diff_decoder_layers):
        l = tnn.Module()
        cba = tnn.Module()
        cba.attention_weights = tnn.Linear(d, cfg.num_poses)
        cba.output_proj = tnn.Linear(d, d)
        cba.value_proj = tnn.Sequential(tnn.Conv2d(d, 256, 3, padding=1), tnn.ReLU())
        l.cross_bev_attention = cba
        l.cross_agent_attention = tnn.MultiheadAttention(d, cfg.tf_num_head, batch_first=True)
        l.cross_ego_attention = tnn.MultiheadAttention(d, cfg.tf_num_head, batch_first=True)
        l.ffn = tnn.Sequential(tnn.Linear(d, cfg.tf_d_ffn), tnn.ReLU(), tnn.Linear(cfg.tf_d_ffn, d))
        l.norm1, l.norm2, l.norm3 = tnn.LayerNorm(d), tnn.LayerNorm(d), tnn.LayerNorm(d)
        tm = tnn.Module()
        tm.scale_shift_mlp = tnn.Sequential(tnn.Mish(), tnn.Linear(256, d * 2))
        l.time_modulation = tm
        td = tnn.Module()
        td.plan_cls_branch = tnn.Sequential(*linear_relu_ln_torch(d, 1, 2), tnn.Linear(d, 1))
        td.plan_reg_branch = tnn.Sequential(tnn.Linear(d, d), tnn.ReLU(), tnn.Linear(d, d),
                                            tnn.ReLU(), tnn.Linear(d, cfg.num_poses * 3))
        l.task_decoder = td
        diff_layers.append(l)
    diff_dec = tnn.Module()
    diff_dec.layers = tnn.ModuleList(diff_layers)
    th.diff_decoder = diff_dec
    root._trajectory_head = th

    return root


def _tree_paths(tree, prefix=()):
    out = {}
    if isinstance(tree, dict) or hasattr(tree, "items"):
        for k, v in tree.items():
            out.update(_tree_paths(v, prefix + (k,)))
    else:
        out["/".join(prefix)] = np.asarray(tree).shape
    return out


def test_full_checkpoint_port_structure_and_forward():
    cfg = tiny_config()
    torch.manual_seed(0)
    skeleton = build_torch_skeleton(cfg)
    sd = skeleton.state_dict()

    variables = port_transfuser_checkpoint(sd, cfg)

    model = DiffusionDriveModel(cfg)
    rng = jax.random.PRNGKey(0)
    camera = jnp.zeros((1, CAM_H, CAM_W, 3), jnp.float32)
    lidar = jnp.zeros((1, LID, LID, 1), jnp.float32)
    status = jnp.zeros((1, 8), jnp.float32)
    ref_vars = jax.jit(model.init)({"params": rng, "diffusion": rng, "dropout": rng},
                                   camera, lidar, status)

    ported = _tree_paths(variables["params"])
    expected = _tree_paths(ref_vars["params"])
    missing = sorted(set(expected) - set(ported))
    extra = sorted(set(ported) - set(expected))
    assert not missing, f"converter misses params: {missing[:10]}"
    assert not extra, f"converter produces unknown params: {extra[:10]}"
    for path, shape in expected.items():
        assert ported[path] == shape, f"{path}: {ported[path]} != {shape}"

    stats_p = _tree_paths(variables["batch_stats"])
    stats_e = _tree_paths(ref_vars["batch_stats"])
    assert set(stats_p) == set(stats_e)

    # the ported variables drive a real forward pass
    out = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"],
         "constants": variables["constants"]},
        camera, lidar, status, rngs={"diffusion": jax.random.PRNGKey(1)},
    )
    assert out["trajectory"].shape == (1, 8, 3)
    assert np.isfinite(np.asarray(out["trajectory"])).all()

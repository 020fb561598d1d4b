"""Numerical parity of the Flax ConditionalUnet1D against a torch twin.

The twin is written independently from standard torch modules (Conv1d,
GroupNorm, ConvTranspose1d, Linear) following the behavioral spec of the
reference's `modules/conditional_unet1d.py` (Conv1dBlock -> GroupNorm ->
Mish; FiLM residual blocks; down/mid/up UNet with skip concats). Weights are
initialized in Flax and copied into the twin; outputs must match in fp32.

This is the same insurance the main model has via `test_torch_parity.py`,
extended to the vanilla diffusion-policy ablation head's denoiser — it pins
the Conv<->Conv1d layout transposes, the ConvTranspose1d(k=4, s=2, p=1)
padding equivalence, and the GroupNorm epsilon.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diffusiondrive_tpu.models.conditional_unet1d import ConditionalUnet1D  # noqa: E402

DOWN_DIMS = (16, 32, 64)
IN_DIM = 3
COND_DIM = 24
DSED = 32


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


class TorchConv1dBlock(tnn.Module):
    def __init__(self, cin, cout, k=3, groups=8):
        super().__init__()
        self.conv = tnn.Conv1d(cin, cout, k, padding=k // 2)
        self.norm = tnn.GroupNorm(groups, cout)

    def forward(self, x):  # (B, C, L)
        return F.mish(self.norm(self.conv(x)))


class TorchCondResBlock(tnn.Module):
    def __init__(self, cin, cout, cond_dim, k=3, groups=8):
        super().__init__()
        self.block0 = TorchConv1dBlock(cin, cout, k, groups)
        self.block1 = TorchConv1dBlock(cout, cout, k, groups)
        self.cond_fc = tnn.Linear(cond_dim, cout)
        self.residual = tnn.Conv1d(cin, cout, 1) if cin != cout else tnn.Identity()

    def forward(self, x, cond):
        out = self.block0(x)
        out = out + self.cond_fc(F.mish(cond))[:, :, None]
        out = self.block1(out)
        return out + self.residual(x)


class TorchUnet(tnn.Module):
    def __init__(self):
        super().__init__()
        g = 8
        cond_dim = DSED + COND_DIM
        dims = list(DOWN_DIMS)
        self.time_fc1 = tnn.Linear(DSED, DSED * 4)
        self.time_fc2 = tnn.Linear(DSED * 4, DSED)
        self.downs = tnn.ModuleList()
        cin = IN_DIM
        for i, d in enumerate(dims):
            self.downs.append(tnn.ModuleList([
                TorchCondResBlock(cin, d, cond_dim, groups=g),
                TorchCondResBlock(d, d, cond_dim, groups=g),
                tnn.Conv1d(d, d, 3, stride=2, padding=1) if i < len(dims) - 1 else tnn.Identity(),
            ]))
            cin = d
        self.mid0 = TorchCondResBlock(dims[-1], dims[-1], cond_dim, groups=g)
        self.mid1 = TorchCondResBlock(dims[-1], dims[-1], cond_dim, groups=g)
        self.ups = tnn.ModuleList()
        for i, d in enumerate(reversed(dims[:-1])):
            skip = dims[::-1][i + 1]  # channel count of the popped skip
            prev = dims[-1] if i == 0 else dims[::-1][i]
            self.ups.append(tnn.ModuleList([
                TorchCondResBlock(prev + skip, d, cond_dim, groups=g),
                TorchCondResBlock(d, d, cond_dim, groups=g),
                tnn.ConvTranspose1d(d, d, 4, stride=2, padding=1),
            ]))
        self.final_block = TorchConv1dBlock(dims[0], dims[0], 3, g)
        self.final_conv = tnn.Conv1d(dims[0], IN_DIM, 1)

    def forward(self, sample, timesteps, global_cond):  # sample (B, C, L)
        from test_ops import torch_sinusoidal_pos_emb

        t_embed = torch_sinusoidal_pos_emb(timesteps.double(), DSED).float()
        t_embed = self.time_fc2(F.mish(self.time_fc1(t_embed)))
        cond = torch.cat([t_embed, global_cond], dim=-1)

        x = sample
        skips = []
        for res0, res1, ds in self.downs:
            x = res1(res0(x, cond), cond)
            skips.append(x)
            x = ds(x)
        x = self.mid1(self.mid0(x, cond), cond)
        for res0, res1, us in self.ups:
            x = torch.cat([x, skips.pop()], dim=1)
            x = us(res1(res0(x, cond), cond))
        return self.final_conv(self.final_block(x))


def _copy_conv(dst, p):  # flax (K, Cin, Cout) -> torch (Cout, Cin, K)
    dst.weight.data = _t(np.transpose(p["kernel"], (2, 1, 0)))
    dst.bias.data = _t(p["bias"])


def _copy_convT(dst, p):  # flax (K, Cin, Cout) -> torch (Cin, Cout, K), kernel flipped
    dst.weight.data = _t(np.transpose(p["kernel"], (1, 2, 0))[..., ::-1].copy())
    dst.bias.data = _t(p["bias"])


def _copy_linear(dst, p):
    dst.weight.data = _t(np.transpose(p["kernel"]))
    dst.bias.data = _t(p["bias"])


def _copy_gn(dst, p):
    dst.weight.data = _t(p["scale"])
    dst.bias.data = _t(p["bias"])


def _copy_block(dst: TorchConv1dBlock, p):
    _copy_conv(dst.conv, p["conv"])
    _copy_gn(dst.norm, p["norm"])


def _copy_res(dst: TorchCondResBlock, p):
    _copy_block(dst.block0, p["block0"])
    _copy_block(dst.block1, p["block1"])
    _copy_linear(dst.cond_fc, p["cond_fc"])
    if not isinstance(dst.residual, tnn.Identity):
        _copy_conv(dst.residual, p["residual_conv"])


def test_conditional_unet1d_matches_torch_twin():
    rng = np.random.default_rng(0)
    B, L = 2, 8
    sample = rng.normal(size=(B, L, IN_DIM)).astype(np.float32)
    cond = rng.normal(size=(B, COND_DIM)).astype(np.float32)
    timesteps = np.array([7, 423], np.int32)

    flax_model = ConditionalUnet1D(
        input_dim=IN_DIM, global_cond_dim=COND_DIM,
        diffusion_step_embed_dim=DSED, down_dims=DOWN_DIMS,
    )
    variables = flax_model.init(jax.random.PRNGKey(0), jnp.asarray(sample),
                                jnp.asarray(timesteps), jnp.asarray(cond))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    twin = TorchUnet().eval()
    _copy_linear(twin.time_fc1, params["time_fc1"])
    _copy_linear(twin.time_fc2, params["time_fc2"])
    for i, (res0, res1, ds) in enumerate(twin.downs):
        _copy_res(res0, params[f"down{i}_res0"])
        _copy_res(res1, params[f"down{i}_res1"])
        if not isinstance(ds, tnn.Identity):
            _copy_conv(ds, params[f"down{i}_ds"])
    _copy_res(twin.mid0, params["mid_res0"])
    _copy_res(twin.mid1, params["mid_res1"])
    for i, (res0, res1, us) in enumerate(twin.ups):
        _copy_res(res0, params[f"up{i}_res0"])
        _copy_res(res1, params[f"up{i}_res1"])
        _copy_convT(us, params[f"up{i}_us"])
    _copy_block(twin.final_block, params["final_block"])
    _copy_conv(twin.final_conv, params["final_conv"])

    ours = np.asarray(flax_model.apply(variables, jnp.asarray(sample),
                                       jnp.asarray(timesteps), jnp.asarray(cond)))
    with torch.no_grad():
        theirs = twin(_t(np.transpose(sample, (0, 2, 1))), _t(timesteps),
                      _t(cond)).numpy().transpose(0, 2, 1)

    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)

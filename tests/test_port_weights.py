"""Weight porting test: a torch ResNet-18 (built from scratch) vs our Flax
twin must produce identical features after porting."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax.numpy as jnp

from diffusiondrive_tpu.models.resnet import ResNetFeatures
from diffusiondrive_tpu.utils.port_weights import port_mha, port_resnet_features


class TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False), tnn.BatchNorm2d(cout)
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + idt)


class TorchResNet18Features(tnn.Module):
    """timm-layout resnet18 features_only twin."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        widths = [64, 128, 256, 512]
        cin = 64
        for i, w in enumerate(widths):
            blocks = [TorchBasicBlock(cin, w, stride=1 if i == 0 else 2), TorchBasicBlock(w, w)]
            setattr(self, f"layer{i + 1}", tnn.Sequential(*blocks))
            cin = w

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        feats = []
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
            feats.append(x)
        return feats


def test_resnet18_port_matches_torch():
    torch.manual_seed(0)
    tmodel = TorchResNet18Features().eval()
    # randomize BN running stats so the test catches stat porting errors
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    variables = port_resnet_features(tmodel.state_dict(), "resnet18")

    x = np.random.default_rng(0).normal(size=(1, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        ref_feats = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))

    model = ResNetFeatures(architecture="resnet18")
    ours = model.apply(variables, jnp.asarray(x), train=False)

    for i, (ref, out) in enumerate(zip(ref_feats, ours)):
        ref_np = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(out), ref_np, atol=2e-4, err_msg=f"stage {i}")


def test_mha_port_matches_torch():
    from diffusiondrive_tpu.models.layers import MultiHeadAttention

    torch.manual_seed(1)
    d, h = 64, 4
    tmha = tnn.MultiheadAttention(d, h, batch_first=True).eval()
    sd = {f"attn.{k}": v for k, v in tmha.state_dict().items()}
    params = port_mha(sd, "attn", d)

    rng = np.random.default_rng(2)
    q = rng.normal(size=(2, 5, d)).astype(np.float32)
    kv = rng.normal(size=(2, 7, d)).astype(np.float32)
    with torch.no_grad():
        ref, _ = tmha(torch.from_numpy(q), torch.from_numpy(kv), torch.from_numpy(kv))

    ours = MultiHeadAttention(d, h).apply(
        {"params": params}, jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv)
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-5)

"""ResNetEncoder numerics vs an independent torch ResNet-18.

The reference wraps torchvision's resnet18 with a replaced 2-channel stem
and a new FC head (``pkl_file_models.py:16-31``). torchvision is not
installed offline, so this test builds the *standard* ResNet-18 v1
architecture (He et al. 2015; identical to torchvision's BasicBlock
layout: stem 7x7/2 -> BN -> relu -> maxpool 3x3/2 -> 4 stages of 2 basic
blocks with 1x1 downsample shortcuts -> global avgpool -> fc) directly in
torch, copies its randomly-initialized weights into the flax
:class:`ResNetEncoder`, and asserts the eval-mode outputs agree. This
pins conv padding conventions, BN eval semantics, maxpool -inf padding,
shortcut placement, and the pool->fc head against an independent
implementation.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from task_aware_audio_coding_perceptual_tpu.models.resnet18_encoder import (  # noqa: E402
    ResNetEncoder,
)


class TorchBasicBlock(torch.nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(cout)
        self.conv2 = torch.nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(cout)
        self.down = None
        if stride != 1 or cin != cout:
            self.down = torch.nn.Sequential(
                torch.nn.Conv2d(cin, cout, 1, stride, bias=False),
                torch.nn.BatchNorm2d(cout),
            )

    def forward(self, x):
        idn = x if self.down is None else self.down(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + idn)


class TorchResNet18(torch.nn.Module):
    def __init__(self, in_ch=2, out_dim=128):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(in_ch, 64, 7, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.maxpool = torch.nn.MaxPool2d(3, 2, 1)
        widths, blocks = [64, 128, 256, 512], []
        cin = 64
        for i, w in enumerate(widths):
            for j in range(2):
                blocks.append(TorchBasicBlock(cin, w, 2 if (i > 0 and j == 0) else 1))
                cin = w
        self.blocks = torch.nn.ModuleList(blocks)
        self.fc = torch.nn.Linear(512, out_dim)

    def forward(self, x):
        h = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        for b in self.blocks:
            h = b(h)
        h = h.mean(dim=(2, 3))
        return self.fc(h)


def _conv(w):
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))


def _bn_params(bn):
    return (
        {"scale": jnp.asarray(bn.weight.detach().numpy()),
         "bias": jnp.asarray(bn.bias.detach().numpy())},
        {"mean": jnp.asarray(bn.running_mean.detach().numpy()),
         "var": jnp.asarray(bn.running_var.detach().numpy())},
    )


def test_resnet18_matches_torch():
    tm = TorchResNet18()
    tm.eval()
    # randomize BN running stats so eval-mode normalization is non-trivial
    g = torch.Generator().manual_seed(0)
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)

    enc = ResNetEncoder(input_channels=2, output_size=128)
    x_np = np.random.default_rng(0).standard_normal((2, 2, 64, 64)).astype(np.float32)
    variables = enc.init(jax.random.key(0), jnp.asarray(x_np))

    params = jax.tree.map(lambda a: a, variables["params"])  # mutable copy
    stats = jax.tree.map(lambda a: a, variables["batch_stats"])

    params["Conv_0"]["kernel"] = _conv(tm.conv1.weight)
    p, s = _bn_params(tm.bn1)
    params["BatchNorm_0"], stats["BatchNorm_0"] = p, s
    for i, b in enumerate(tm.blocks):
        bp, bs = params[f"BasicBlock_{i}"], stats[f"BasicBlock_{i}"]
        bp["Conv_0"]["kernel"] = _conv(b.conv1.weight)
        bp["BatchNorm_0"], bs["BatchNorm_0"] = _bn_params(b.bn1)
        bp["Conv_1"]["kernel"] = _conv(b.conv2.weight)
        bp["BatchNorm_1"], bs["BatchNorm_1"] = _bn_params(b.bn2)
        if b.down is not None:
            bp["Conv_2"]["kernel"] = _conv(b.down[0].weight)
            bp["BatchNorm_2"], bs["BatchNorm_2"] = _bn_params(b.down[1])
    params["Dense_0"]["kernel"] = jnp.asarray(tm.fc.weight.detach().numpy().T)
    params["Dense_0"]["bias"] = jnp.asarray(tm.fc.bias.detach().numpy())

    with torch.no_grad():
        ref = tm(torch.from_numpy(x_np)).numpy()
    out, _ = enc.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x_np), train=False)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)

"""Torch checkpoint import: output parity between a torch U-Net and the
Flax U-Net loaded with its weights.

This validates (a) the structural state-dict mapper and (b) the Flax
RestorationUNet graph semantics (conv/BN-eval/LeakyReLU/ConvTranspose/
concat order) against PyTorch — the framework the reference's checkpoints
come from (restoration_net.py architecture).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from robust_object_detection_tpu.models import import_torch as IT  # noqa
from robust_object_detection_tpu.models import unet as unet_lib  # noqa


class TorchConvBlock(torch.nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.block = torch.nn.Sequential(
            torch.nn.Conv2d(cin, cout, 3, padding=1, bias=False),
            torch.nn.BatchNorm2d(cout),
            torch.nn.LeakyReLU(0.2),
            torch.nn.Conv2d(cout, cout, 3, padding=1, bias=False),
            torch.nn.BatchNorm2d(cout),
            torch.nn.LeakyReLU(0.2),
        )

    def forward(self, x):
        return self.block(x)


class TorchUpBlock(torch.nn.Module):
    """ConvTranspose then ConvBlock, registered in forward order — the
    reference's UpBlock layout (restoration_net.py:44-57). Module
    REGISTRATION order matching call order is what the structural importer
    keys on."""

    def __init__(self, cin, skip, cout):
        super().__init__()
        self.up = torch.nn.ConvTranspose2d(cin, cin, 2, stride=2)
        self.conv = TorchConvBlock(cin + skip, cout)

    def forward(self, x, s):
        x = self.up(x)
        return self.conv(torch.cat([x, s], dim=1))


class TorchUNet(torch.nn.Module):
    """Same architecture family as the reference RestorationUNet
    (restoration_net.py:60-106) at reduced width for the test."""

    def __init__(self, channels=(8, 16)):
        super().__init__()
        c = list(channels)
        self.downs = torch.nn.ModuleList()
        cin = 3
        for ch in c:
            self.downs.append(TorchConvBlock(cin, ch))
            cin = ch
        self.pool = torch.nn.MaxPool2d(2)
        self.bottleneck = TorchConvBlock(c[-1], c[-1])
        out_ch = c[-2::-1] + [c[0]]
        skip_ch = c[::-1]
        prev = c[-1]
        self.ups = torch.nn.ModuleList()
        for skip, oc in zip(skip_ch, out_ch):
            self.ups.append(TorchUpBlock(prev, skip, oc))
            prev = oc
        self.out_conv = torch.nn.Conv2d(c[0], 3, 1)

    def forward(self, x):
        inp = x
        skips = []
        for d in self.downs:
            x = d(x)
            skips.append(x)
            x = self.pool(x)
        x = self.bottleneck(x)
        for up, skip in zip(self.ups, reversed(skips)):
            x = up(x, skip)
        return torch.clamp(inp + self.out_conv(x), 0.0, 1.0)


def test_unet_output_parity(tmp_path):
    torch.manual_seed(0)
    tm = TorchUNet((8, 16)).eval()
    # randomise BN stats so the import is actually exercised
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    ckpt = tmp_path / "unet.pth"
    torch.save({"model": tm.state_dict()}, ckpt)

    model = unet_lib.create(channels=(8, 16))
    variables = unet_lib.init_variables(model, jax.random.key(0), patch=32)
    state = IT.load_torch_state(str(ckpt))
    order = IT.module_call_order(model, jax.random.key(0),
                                 jnp.zeros((1, 32, 32, 3)), train=False)
    new_vars, report = IT.assign(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, state, order)

    x = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
    y_flax = np.asarray(model.apply(new_vars, jnp.asarray(x), train=False))
    with torch.no_grad():
        y_torch = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    y_torch = y_torch.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(y_flax, y_torch, atol=2e-5)


def test_layout_conversions():
    w = np.arange(2 * 3 * 4 * 5, dtype=np.float32).reshape(2, 3, 4, 5)
    assert IT.conv_kernel(w).shape == (4, 5, 3, 2)
    assert IT.conv_transpose_kernel(w).shape == (4, 5, 2, 3)
    d = np.arange(6).reshape(2, 3).astype(np.float32)
    np.testing.assert_array_equal(IT.dense_kernel(d), d.T)


def test_strict_mismatch_raises(tmp_path):
    tm = TorchUNet((8, 16))
    sd = tm.state_dict()
    sd.pop(list(sd)[-1])                      # drop a tensor
    ckpt = tmp_path / "broken.pth"
    torch.save(sd, ckpt)
    model = unet_lib.create(channels=(8, 16))
    variables = unet_lib.init_variables(model, jax.random.key(0), patch=32)
    order = IT.module_call_order(model, jax.random.key(0),
                                 jnp.zeros((1, 32, 32, 3)), train=False)
    with pytest.raises(ValueError):
        IT.assign({"params": variables["params"],
                   "batch_stats": variables["batch_stats"]},
                  IT.load_torch_state(str(ckpt)), order)

"""Dilated ResNet34-8s segmenter: parity vs a torch mirror of the reference
architecture (resnet.py + utils.py:933-968) incl. checkpoint conversion."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from munit_tpu.nn.resnet import (
    ResNet34_8s, convert_resnet34_8s_state_dict, seg_preprocess,
)


def conv3x3(cin, cout, stride=1, dilation=1):
    pad = ((3 - 1) * (dilation - 1) + 3 - 1) // 2
    return nn.Conv2d(cin, cout, 3, stride, pad, dilation, bias=False)


class TBasic(nn.Module):
    def __init__(self, cin, planes, stride=1, dilation=1):
        super().__init__()
        self.conv1 = conv3x3(cin, planes, stride, dilation)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = conv3x3(planes, planes, 1, dilation)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = None
        if stride != 1 or cin != planes:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes, 1, stride, bias=False),
                nn.BatchNorm2d(planes))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + idn)


class TResnet34_8s(nn.Module):
    """Mirror with reference state_dict keys (resnet34_8s.<...>)."""

    def __init__(self, num_classes=19):
        super().__init__()
        trunk = nn.Module()
        trunk.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        trunk.bn1 = nn.BatchNorm2d(64)
        cfg = [(64, 3, 1, 1), (128, 4, 2, 1), (256, 6, 1, 2), (512, 3, 1, 4)]
        cin = 64
        for li, (planes, blocks, stride, dil) in enumerate(cfg):
            mods = []
            for bi in range(blocks):
                mods.append(TBasic(cin, planes, stride if bi == 0 else 1, dil))
                cin = planes
            setattr(trunk, f"layer{li + 1}", nn.Sequential(*mods))
        trunk.fc = nn.Conv2d(512, num_classes, 1)
        self.resnet34_8s = trunk

    def forward(self, x):
        t = self.resnet34_8s
        h = F.relu(t.bn1(t.conv1(x)))
        h = F.max_pool2d(h, 3, 2, 1)
        h = t.layer4(t.layer3(t.layer2(t.layer1(h))))
        h = t.fc(h)
        return F.interpolate(h, size=x.shape[2:], mode="bilinear",
                             align_corners=False)


def test_resnet34_8s_parity():
    torch.manual_seed(0)
    tnet = TResnet34_8s(num_classes=19).eval()
    # randomize BN running stats so the test exercises real stats conversion
    for m in tnet.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)

    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    variables = jax.tree.map(jnp.asarray, convert_resnet34_8s_state_dict(sd))
    jnet = ResNet34_8s(num_classes=19)

    rng = np.random.RandomState(0)
    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()))
    got = jnet.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got),
                               np.transpose(want.numpy(), (0, 2, 3, 1)),
                               rtol=1e-3, atol=1e-3)


def test_seg_preprocess():
    x = jnp.zeros((1, 4, 4, 3))  # [-1,1] gray 0 → [0,1] 0.5 → ImageNet norm
    got = np.asarray(seg_preprocess(x))
    want = (0.5 - np.array([0.485, 0.456, 0.406])) / \
        np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(got[0, 0, 0], want, rtol=1e-5)

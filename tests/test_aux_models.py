"""Aux model zoo: flood classifier (resnet18) parity vs torch, domain
classifier behavior, VGG16 parity, HTML writer."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from munit_tpu.nn.resnet18 import FloodClassifier, convert_resnet18_state_dict
from munit_tpu.nn.vgg import Vgg16, convert_vgg16_state_dict, vgg_preprocess
from munit_tpu.nn.classifiers import DomainClassifier


def test_flood_classifier_shapes_and_converter():
    net = FloodClassifier()
    x = jnp.zeros((2, 224, 224, 3))
    variables = jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0), x))
    out = jax.eval_shape(lambda v: net.apply(v, x), variables)
    assert out.shape == (2, 2)

    # converter round-trip on synthetic torchvision-format keys
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    sd = {}
    for kp, leaf in flat:
        path = [k.key for k in kp]
        col, scope = path[0], path[1:]
        t = ".".join(s.replace("_", ".", 1) if s.startswith("layer") else s
                     for s in scope[:-1])
        leafname = scope[-1]
        if col == "params":
            if leafname in ("conv1", "conv2", "down_conv"):
                key = {"conv1": "conv1.weight", "conv2": "conv2.weight",
                       "down_conv": "downsample.0.weight"}[leafname]
                full = f"{t}.{key}" if t else key
                sd[full] = np.zeros((leaf.shape[3], leaf.shape[2],
                                     leaf.shape[0], leaf.shape[1]), np.float32)
            elif leafname == "fc_kernel":
                sd["fc.weight"] = np.zeros((leaf.shape[1], leaf.shape[0]),
                                           np.float32)
            elif leafname == "fc_bias":
                sd["fc.bias"] = np.zeros(leaf.shape, np.float32)
    # fill BN keys generically from the module's own stats/scales
    for kp, leaf in flat:
        path = [k.key for k in kp]
        col = path[0]
        scope = path[1:]
        if scope and scope[-1] in ("scale", "bias", "mean", "var"):
            bnname = scope[-2]
            prefix = ".".join(
                s.replace("_", ".", 1) if s.startswith("layer") else s
                for s in scope[:-2])
            tbn = {"bn1": "bn1", "bn2": "bn2", "down_bn": "downsample.1"}[bnname]
            full = f"{prefix}.{tbn}" if prefix else tbn
            leaf_t = {"scale": "weight", "bias": "bias", "mean": "running_mean",
                      "var": "running_var"}[scope[-1]]
            sd[f"{full}.{leaf_t}"] = np.zeros(leaf.shape, np.float32)
    converted = convert_resnet18_state_dict(sd)
    want = jax.tree.map(lambda l: l.shape, variables)
    got = jax.tree.map(lambda l: np.asarray(l).shape,
                       {"params": converted["params"],
                        "batch_stats": converted["batch_stats"]})
    assert want == got


class _TVgg(nn.Module):
    """Torch mirror of the reference VGG16 relu5_3 trunk (networks.py:755-804)."""

    def __init__(self):
        super().__init__()
        cfg = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256),
               (256, 256), (256, 256), (256, 512), (512, 512), (512, 512),
               (512, 512), (512, 512), (512, 512)]
        names = ["conv1_1", "conv1_2", "conv2_1", "conv2_2", "conv3_1",
                 "conv3_2", "conv3_3", "conv4_1", "conv4_2", "conv4_3",
                 "conv5_1", "conv5_2", "conv5_3"]
        for n, (i, o) in zip(names, cfg):
            setattr(self, n, nn.Conv2d(i, o, 3, 1, 1))

    def forward(self, x):
        h = F.relu(self.conv1_2(F.relu(self.conv1_1(x))))
        h = F.max_pool2d(h, 2, 2)
        h = F.relu(self.conv2_2(F.relu(self.conv2_1(h))))
        h = F.max_pool2d(h, 2, 2)
        h = F.relu(self.conv3_3(F.relu(self.conv3_2(F.relu(self.conv3_1(h))))))
        h = F.max_pool2d(h, 2, 2)
        h = F.relu(self.conv4_3(F.relu(self.conv4_2(F.relu(self.conv4_1(h))))))
        return F.relu(self.conv5_3(F.relu(self.conv5_2(F.relu(self.conv5_1(h))))))


def test_vgg16_parity():
    torch.manual_seed(0)
    tnet = _TVgg().eval()
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = convert_vgg16_state_dict(sd)
    jnet = Vgg16()

    rng = np.random.RandomState(0)
    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()))
    got = jnet.apply({"params": jax.tree.map(jnp.asarray, params)},
                     jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got),
                               np.transpose(want.numpy(), (0, 2, 3, 1)),
                               rtol=1e-3, atol=1e-3)


def test_vgg_preprocess():
    x = jnp.ones((1, 2, 2, 3)) * jnp.asarray([1.0, 0.0, -1.0])
    out = np.asarray(vgg_preprocess(x))
    # R=1 → 255, G=0 → 127.5, B=-1 → 0; BGR order, Caffe means subtracted
    np.testing.assert_allclose(
        out[0, 0, 0], [0 - 103.939, 127.5 - 116.779, 255 - 123.680],
        rtol=1e-5)


def test_domain_classifier_shapes():
    net = DomainClassifier()
    x = jnp.zeros((2, 64, 64, 256))
    variables = net.init(jax.random.PRNGKey(0), x)
    out, _ = net.apply(variables, x, True, mutable=["batch_stats"])
    assert out.shape == (2, 1)


def test_html_writer(tmp_path):
    from munit_tpu.utils.html import write_html
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    for n in ["gen_a2b_train_current.jpg", "gen_b2a_train_current.jpg",
              "gen_a2b_test_00001000.jpg", "gen_b2a_test_00001000.jpg"]:
        (img_dir / n).write_bytes(b"x")
    out = tmp_path / "index.html"
    write_html(str(out), 1000, 1000, str(img_dir))
    html = out.read_text()
    assert "gen_a2b_test_00001000.jpg" in html
    assert "train_current" in html


def test_flood_classifier_transform_semantics():
    """transform_torchVar parity (utils.py:177-189): resize-256 shorter side,
    center-crop 224, ImageNet normalization, HWC float32."""
    from PIL import Image
    from munit_tpu.nn.resnet18 import flood_classifier_transform

    rng = np.random.RandomState(0)
    img = Image.fromarray(rng.randint(0, 255, (300, 400, 3), np.uint8))
    out = flood_classifier_transform(img)
    assert out.shape == (224, 224, 3) and out.dtype == np.float32

    # composition check against the already-torchvision-pinned primitives
    # (test_resize_shorter_semantics): resize-256 → center-crop 224 →
    # [0,1] → ImageNet normalize
    from munit_tpu.data import transforms as T
    r = T.resize_shorter(img, 256)
    w, h = r.size
    want01 = T.to_array01(T.crop(r, (h - 224) // 2, (w - 224) // 2, 224, 224))
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    np.testing.assert_allclose(out * std + mean, want01, atol=1e-6)
    assert (h, w) == (256, 341)   # shorter-side resize, not square

"""LPIPS(net='alex') parity vs a hand-rolled torch oracle of the lpips
package's forward (lpips/lpips.py + lpips/pretrained_networks.py `alexnet`;
the reference GA fitness at `/root/reference/GA/evaluation.py:13` uses
`LPIPS(net='alex')`).  The lpips package / torchvision are not installed in
this environment, so the oracle reproduces the exact published formula:
scaling layer -> AlexNet features taps -> channel-unit-normalize (+1e-10)
-> squared diff -> 1x1 lin conv -> spatial mean -> sum over taps."""

import numpy as np
import pytest
import torch
from torch import nn

import jax
import jax.numpy as jnp

from gagan_tpu.metrics import alexnet
from gagan_tpu.utils import checkpoint as ckpt_lib


class TorchAlexFeatures(nn.Module):
    """torchvision AlexNet .features[0:12] (the lpips slices)."""

    def __init__(self):
        super().__init__()
        self.features = nn.Sequential(
            nn.Conv2d(3, 64, 11, 4, 2), nn.ReLU(inplace=True),
            nn.MaxPool2d(3, 2),
            nn.Conv2d(64, 192, 5, 1, 2), nn.ReLU(inplace=True),
            nn.MaxPool2d(3, 2),
            nn.Conv2d(192, 384, 3, 1, 1), nn.ReLU(inplace=True),
            nn.Conv2d(384, 256, 3, 1, 1), nn.ReLU(inplace=True),
            nn.Conv2d(256, 256, 3, 1, 1), nn.ReLU(inplace=True),
        )

    def forward(self, x):
        taps = []
        for i, layer in enumerate(self.features):
            x = layer(x)
            if i in (1, 4, 7, 9, 11):
                taps.append(x)
        return taps


def torch_lpips_alex(net, lins, a, b):
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def normalize(t):
        norm = torch.sqrt(torch.sum(t ** 2, dim=1, keepdim=True))
        return t / (norm + 1e-10)

    taps_a = net((a - shift) / scale)
    taps_b = net((b - shift) / scale)
    total = 0.0
    for ta, tb, lin in zip(taps_a, taps_b, lins):
        diff = (normalize(ta) - normalize(tb)) ** 2
        val = torch.nn.functional.conv2d(diff, lin)       # [N,1,H,W]
        total = total + val.mean(dim=(2, 3)).squeeze(1)
    return total


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    net = TorchAlexFeatures().eval()
    lins = [torch.rand(1, c, 1, 1) * 0.2
            for c in alexnet.LPIPS_CHANNELS]

    sd = {f"net.slice0.{k}": v for k, v in net.state_dict().items()}
    # Re-key to the lpips layout (net.sliceK.<tv_idx>.<param>).
    slice_of = {0: 1, 3: 2, 6: 3, 8: 4, 10: 5}
    sd = {}
    for k, v in net.state_dict().items():
        idx = int(k.split(".")[1])
        sd[f"net.slice{slice_of[idx]}.{idx}.{k.split('.')[-1]}"] = v
    for i, lin in enumerate(lins):
        sd[f"lin{i}.model.1.weight"] = lin
    sd["scaling_layer.shift"] = torch.tensor(
        [-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    sd["scaling_layer.scale"] = torch.tensor(
        [0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    import sys

    sys.path.insert(0, "/root/repo")
    from tools.convert_weights import lpips_alex_to_flat

    params = ckpt_lib.flat_to_tree(lpips_alex_to_flat(sd))
    return net, lins, params


def test_lpips_alex_parity(pair):
    net, lins, params = pair
    rng = np.random.RandomState(0)
    a = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = torch_lpips_alex(net, lins, torch.from_numpy(a),
                                torch.from_numpy(b)).numpy()
    got = np.asarray(alexnet.lpips_distance(params, jnp.asarray(a),
                                            jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_lpips_embedding_matches_distance(pair):
    _, _, params = pair
    rng = np.random.RandomState(1)
    a = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    d = np.asarray(alexnet.lpips_distance(params, jnp.asarray(a),
                                          jnp.asarray(b)))
    ea = np.asarray(alexnet.lpips_embedding(params, jnp.asarray(a)))
    eb = np.asarray(alexnet.lpips_embedding(params, jnp.asarray(b)))
    np.testing.assert_allclose(np.sum((ea - eb) ** 2, axis=1), d,
                               rtol=1e-4, atol=1e-6)


def test_ga_calculate_metrics_with_alex(pair):
    """calculate_metrics consumes the pairwise interface (the reference
    protocol) and reports a finite LPIPS."""
    _, _, params = pair
    from gagan_tpu.ga import evaluation as ga_eval

    rng = np.random.RandomState(2)
    real = rng.randint(0, 255, (8, 3, 32, 32), np.uint8)
    gen = rng.randint(0, 255, (8, 3, 32, 32), np.uint8)

    def feature_fn(imgs):
        return jnp.asarray(imgs, jnp.float32).reshape(imgs.shape[0], -1)

    pair_fn = jax.jit(
        lambda x, y: alexnet.lpips_distance(params, x, y))
    fid, kid, lp = ga_eval.calculate_metrics(
        real, gen, feature_fn, kid_subset_size=4, lpips_pair_fn=pair_fn)
    assert np.isfinite(lp) and lp >= 0
    assert np.isfinite(fid)

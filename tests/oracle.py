"""Helpers to load the reference PyTorch implementations as numeric oracles.

The reference tree at /root/reference is imported read-only purely to obtain
golden values for parity tests (its pure-PyTorch CUDA-op fallbacks and CPU
network forwards).  Two helper patches restore original NVlabs semantics that
the GA-GAN fork broke (SynthesisBlock.forward asserts on img=None at the first
block; see SURVEY.md §0).
"""

import sys

DISSIMILAR = "/root/reference/DissimilarDomains"
SIMILAR = "/root/reference/SimilarDomains"

for p in (DISSIMILAR, SIMILAR):
    if p not in sys.path:
        sys.path.insert(0, p)

# The reference's grid_sample_gradfix imports pkg_resources, which modern
# setuptools no longer ships; shim parse_version from packaging.
if "pkg_resources" not in sys.modules:
    import types

    from packaging.version import parse as _parse_version

    _shim = types.ModuleType("pkg_resources")
    _shim.parse_version = _parse_version
    sys.modules["pkg_resources"] = _shim

_patched = False


def patch_reference():
    """Make the fork's broken SynthesisBlock.forward tolerate img=None."""
    global _patched
    if _patched:
        return
    from torch_utils import misc
    from torch_utils.ops import upfirdn2d as _u

    orig_assert = misc.assert_shape
    misc.assert_shape = lambda t, s: None if t is None else orig_assert(t, s)
    orig_up = _u.upsample2d

    def _up(*args, **kw):
        img = args[0] if args else kw.get("x", kw.get("img"))
        return None if img is None else orig_up(*args, **kw)

    _u.upsample2d = _up
    _patched = True


def ref_ops():
    from torch_utils.ops import bias_act, conv2d_resample, upfirdn2d

    return upfirdn2d, bias_act, conv2d_resample


def ref_networks():
    patch_reference()
    from training import networks

    return networks


def install_torchvision_stub():
    """Let the reference restyle/fpn encoder modules import.

    They do `from torchvision.models import resnet34` at module top and call
    `resnet34(pretrained=True)` — torchvision is not in this environment and
    there is no egress for weights.  The stub provides a hand-built torch
    ResNet34 (BasicBlock layout + state_dict names identical to
    torchvision's) with `pretrained` accepted and ignored (random init),
    which is exactly what a random-weight parity oracle needs: the reference
    encoder code runs verbatim on top of it, reading only .layer1..layer4.
    """
    import sys
    import types

    import torch
    from torch import nn

    existing = sys.modules.get("torchvision")
    if existing is not None and hasattr(
            getattr(existing, "models", None), "resnet34"):
        return existing
    # A bare placeholder stub may already sit in sys.modules (e.g.
    # verify_parity's dlib/clip/torchvision import shims) — upgrade it
    # rather than bailing, or `from torchvision.models.resnet import ...`
    # dies with "'torchvision' is not a package".

    class BasicBlock(nn.Module):
        def __init__(self, in_c, out_c, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(in_c, out_c, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(out_c)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = nn.Conv2d(out_c, out_c, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(out_c)
            self.downsample = None
            if stride != 1 or in_c != out_c:
                self.downsample = nn.Sequential(
                    nn.Conv2d(in_c, out_c, 1, stride, bias=False),
                    nn.BatchNorm2d(out_c))

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class ResNet34(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            plan = [(64, 64, 3, 1), (64, 128, 4, 2), (128, 256, 6, 2),
                    (256, 512, 3, 2)]
            for li, (in_c, out_c, n, stride) in enumerate(plan, start=1):
                blocks = [BasicBlock(in_c, out_c, stride)]
                blocks += [BasicBlock(out_c, out_c) for _ in range(n - 1)]
                setattr(self, f"layer{li}", nn.Sequential(*blocks))

    def resnet34(pretrained=False, **kw):
        return ResNet34()

    # restyle_e4e_encoders.py keeps the upstream restyle repo's import
    # layout (`models.encoders.*`) which the reference tree does not ship —
    # alias it onto the in-tree copies so the module imports.
    if "models.encoders.helpers" not in sys.modules:
        for p in (SIMILAR,):
            if p not in sys.path:
                sys.path.insert(0, p)
        from restyle_encoders.encoders import helpers, map2style

        models_pkg = types.ModuleType("models")
        enc_pkg = types.ModuleType("models.encoders")
        models_pkg.encoders = enc_pkg
        enc_pkg.helpers = helpers
        enc_pkg.map2style = map2style
        sys.modules.setdefault("models", models_pkg)
        sys.modules["models.encoders"] = enc_pkg
        sys.modules["models.encoders.helpers"] = helpers
        sys.modules["models.encoders.map2style"] = map2style

    import importlib.machinery

    tv = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")
    resnet_mod = types.ModuleType("torchvision.models.resnet")
    resnet_mod.resnet34 = resnet34
    models.resnet34 = resnet34
    models.resnet = resnet_mod
    tv.models = models
    # Other libraries probe availability via importlib.util.find_spec,
    # which raises ValueError on an in-sys.modules module whose __spec__
    # is None (transformers does exactly this) — give each stub a real
    # ModuleSpec.  transformers then treats torchvision as "available",
    # which is harmless for the model classes the suite touches (only
    # image processors import torchvision symbols).
    for name, mod in (("torchvision", tv),
                      ("torchvision.models", models),
                      ("torchvision.models.resnet", resnet_mod)):
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules[name] = mod
    return tv

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

"""Import the UPSTREAM reference (read-only at /root/reference) as a torch
CPU oracle for golden-activation parity tests.

The reference's import graph pulls heavy optional deps (torchvision,
skimage, insightface, mediapipe, ...) that this image lacks and that the
arch forward paths never touch; a meta-path finder fabricates inert stub
modules for them. The reference code itself is never copied — it is
imported in place purely to generate expected activations.
"""
import importlib.abc
import importlib.machinery
import importlib.util
import sys
import types

_STUB_ROOTS = {
    "torchvision", "skimage", "imageio", "lmdb", "decord", "av", "cv2",
    "pandas", "face_alignment", "wandb", "lpips", "insightface",
    "mediapipe", "onnxruntime", "moviepy", "flow_vis", "matplotlib",
    "thop", "tqdm", "ffmpeg",
}


class _StubMeta(type):
    def __getattr__(cls, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return _stub_class(name)


def _stub_class(name):
    return _StubMeta(name, (object,), {
        "__init__": lambda self, *a, **k: None,
        "__call__": lambda self, *a, **k: None,
    })


def _mod_getattr(attr):
    if attr.startswith("__"):
        raise AttributeError(attr)
    return _stub_class(attr)


class _StubLoader(importlib.abc.Loader):
    def create_module(self, spec):
        m = types.ModuleType(spec.name)
        m.__path__ = []
        m.__getattr__ = _mod_getattr
        return m

    def exec_module(self, module):
        pass


class _StubFinder(importlib.abc.MetaPathFinder):
    def find_spec(self, name, path=None, target=None):
        root = name.split(".")[0]
        if root in _STUB_ROOTS:
            # only stub packages genuinely missing from the image
            if root in sys.modules and not hasattr(
                    sys.modules[root], "__getattr__"):
                return None
            return importlib.machinery.ModuleSpec(
                name, _StubLoader(), is_package=True)
        return None


_installed = False


def import_reference():
    """Returns the `basicsr` package of the reference, or None if the
    reference checkout is unavailable."""
    global _installed
    import os

    if not os.path.isdir("/root/reference/basicsr"):
        return None
    if not _installed:
        # don't stub packages that actually exist
        for root in list(_STUB_ROOTS):
            if importlib.util.find_spec(root) is not None:
                _STUB_ROOTS.discard(root)
        sys.meta_path.insert(0, _StubFinder())
        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        _installed = True
    import basicsr  # noqa: F401
    return basicsr

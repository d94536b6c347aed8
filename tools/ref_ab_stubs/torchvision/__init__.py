"""Minimal torchvision stub so the REFERENCE's label-only (imageless)
embedding drivers import on this machine (torchvision is not installed;
the `with_images=False` path never applies a transform or builds a CNN —
db.py:3850-3854)."""


class _AnyCallable:
    def __init__(self, *a, **k):
        pass

    def __call__(self, *a, **k):
        raise RuntimeError(
            "torchvision stub invoked at runtime — the label-only "
            "reference path should never execute transforms/models")


class _Namespace:
    def __getattr__(self, name):
        return _AnyCallable


datasets = _Namespace()
models = _Namespace()
transforms = _Namespace()
__version__ = "0.2.2-stub"

"""Minimal lime stub: network/inference.py imports lime_image at module
top; the fc7 joint path never runs LIME."""


class _Unused:
    def __getattr__(self, name):
        raise RuntimeError("lime stub invoked at runtime")


lime_image = _Unused()

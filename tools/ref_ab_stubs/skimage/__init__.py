"""Minimal skimage stub: data/db.py imports `io, transform` but never
uses them (grep: single import line)."""


class _Unused:
    def __getattr__(self, name):
        raise RuntimeError("skimage stub invoked at runtime")


io = _Unused()
transform = _Unused()

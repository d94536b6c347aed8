"""Minimal gitpython stub for reference-driver config_params.txt dumps."""


class _Obj:
    hexsha = "reference-ab-harness"


class _Head:
    object = _Obj()


class _Branch:
    name = "reference"


class Repo:
    def __init__(self, *a, **k):
        self.head = _Head()
        self.active_branch = _Branch()

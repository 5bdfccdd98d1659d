"""Import-rot guard for examples/: every example must import cleanly (no
side effects outside the __main__ guard) and expose a `main` callable.

The examples are the reference README's usage snippets grown into runnable
scripts (reference README.md:39-138 is the de-facto test surface of the
reference build, SURVEY.md §4); full runs are too slow for CI, but an
import catches API drift — a renamed trainer kwarg or moved symbol breaks
here instead of in a user's first copy-paste.
"""

import importlib.util
import sys
from pathlib import Path

import pytest

EXAMPLES = sorted((Path(__file__).parent.parent / "examples").glob("*.py"))


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.stem)
def test_example_imports_and_has_main(path):
    spec = importlib.util.spec_from_file_location(f"example_{path.stem}", path)
    mod = importlib.util.module_from_spec(spec)
    # examples sys.path-insert the repo root themselves; keep sys.modules
    # clean so repeated parametrized imports don't collide
    sys.modules[spec.name] = mod
    try:
        spec.loader.exec_module(mod)
        assert callable(getattr(mod, "main", None)), (
            f"{path.name} must define main()"
        )
    finally:
        sys.modules.pop(spec.name, None)

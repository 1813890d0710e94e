"""Ordering-proof loader for the reference's own torch modules.

The golden-parity tests import /root/reference/{diffusion,vae,...}.py, whose
module names COLLIDE with this repo's root entry scripts (diffusion.py etc.).
A module-scope ``sys.path.insert(0, "/root/reference")`` is not enough: any
code imported later in the same pytest process may prepend the repo root
again (tools/fid_eval.py does, for its script mode), after which a bare
``import diffusion`` silently resolves to the 7-line entry script and the
test dies with AttributeError (observed as a test-ordering-only failure in
the quick gate).

``load_reference(name)`` re-pins /root/reference to the front of sys.path at
IMPORT TIME and verifies the resolved module actually came from the
reference tree before returning it.
"""

import importlib
import sys

REFERENCE_DIR = "/root/reference"


def load_reference(name: str):
    """Import /root/reference/<name>.py, immune to sys.path reordering."""
    while REFERENCE_DIR in sys.path:
        sys.path.remove(REFERENCE_DIR)
    sys.path.insert(0, REFERENCE_DIR)
    cached = sys.modules.get(name)
    if cached is not None and not getattr(cached, "__file__", "").startswith(
        REFERENCE_DIR
    ):
        # A repo-root entry script with the same name was imported first —
        # evict it so the reference module can load under this name.
        del sys.modules[name]
    mod = importlib.import_module(name)
    assert getattr(mod, "__file__", "").startswith(REFERENCE_DIR), (
        f"{name} resolved to {getattr(mod, '__file__', '?')} instead of "
        f"{REFERENCE_DIR} — sys.path shadowing"
    )
    return mod

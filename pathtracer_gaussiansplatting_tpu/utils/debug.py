"""Debug checks: checkify wrapping + NaN/Inf scans (SURVEY §5).

The reference leans on Vulkan validation layers in debug builds
(engine.h:24-31); XLA is data-race-free by construction, so the TPU-native
debug tier is numerical: ``checked`` wraps any jitted render function in
``jax.experimental.checkify`` float checks (NaN/Inf/div-by-zero raised as
clean Python errors with tracebacks into the traced source), and
``scan_finite`` host-scans output pytrees (capture uses it under its
``debug_checks`` flag, so a NaN-producing scene fails loudly instead of
propagating garbage into the dataset).
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import numpy as np
from jax.experimental import checkify


def checked(fn, *, errors=None):
    """Wrap ``fn`` so float errors (NaN/Inf) raise instead of propagating.

    Returns a callable with the same signature; the wrapped function runs
    under ``checkify.checkify`` with float + div checks and calls
    ``err.throw()`` on the result. Works through jit (the checks ride the
    compiled program).
    """
    errs = errors if errors is not None \
        else (checkify.float_checks | checkify.div_checks)
    cfn = checkify.checkify(fn, errors=errs)

    @functools.wraps(fn)
    def wrapper(*args, **kw):
        err, out = cfn(*args, **kw)
        err.throw()
        return out

    return wrapper


def scan_finite(tree: Any, context: str = "output") -> None:
    """Host-side NaN/Inf scan of a pytree; raises FloatingPointError.

    Cheap enough to run per pose under capture's ``debug_checks`` flag —
    one pass over the already-materialized arrays.
    """
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.issubdtype(arr.dtype, np.floating):
            continue
        n_bad = int((~np.isfinite(arr)).sum())
        if n_bad:
            bad.append(f"{jax.tree_util.keystr(path)}: {n_bad}/{arr.size} "
                       "non-finite")
    if bad:
        raise FloatingPointError(
            f"non-finite values in {context}: " + "; ".join(bad))

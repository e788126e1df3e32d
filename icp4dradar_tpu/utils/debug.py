"""Runtime validation guards (SURVEY.md §5 race-detection/sanitizer row:
the functional design makes data races unrepresentable; what remains worth
guarding is numerics — NaN/Inf poisoning and malformed scans).

`checked(fn)` wraps a jitted function with jax.experimental.checkify so
NaN/div/OOB errors surface as Python exceptions in tests/debug runs instead
of silently corrupting trajectories. `validate_scan` / `assert_finite_tree`
are cheap host-side preflight checks for pipeline entry points.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import checkify


def checked(fn, errors=checkify.float_checks):
    """Wrap fn so float errors (NaN/Inf/div) raise on call."""
    cfn = checkify.checkify(fn, errors=errors)

    def run(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return run


def assert_finite_tree(tree: Any, name: str = "pytree") -> None:
    """Host-side: raise if any array leaf contains NaN/Inf."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            keystr = jax.tree_util.keystr(path)
            bad = int((~np.isfinite(arr)).sum())
            raise FloatingPointError(
                f"{name}{keystr}: {bad} non-finite values"
            )


def validate_scan(scan, name: str = "scan") -> None:
    """Preflight a RadarScan: shapes consistent, mask binary, finite data
    in valid slots."""
    n = scan.xyz.shape[0]
    for field in ("doppler", "intensity", "mask"):
        arr = getattr(scan, field)
        if arr.shape[0] != n:
            raise ValueError(f"{name}.{field} length {arr.shape[0]} != {n}")
    m = np.asarray(scan.mask)
    if not np.isin(m, (0.0, 1.0)).all():
        raise ValueError(f"{name}.mask must be binary 0/1")
    valid = m > 0.5
    xyz = np.asarray(scan.xyz)[valid]
    if not np.isfinite(xyz).all():
        raise FloatingPointError(f"{name}: non-finite coordinates in valid points")

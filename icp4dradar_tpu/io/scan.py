"""RadarScan: the fixed-shape, masked scan container every stage consumes.

The reference carries per-point structs (`RadarPoint_Info2`,
include/userdefine.h:21-29) with derived range/azimuth/elevation computed in
the parse loop (src/iterative_closest_point.cpp:373-384). Here a scan is a
padded struct-of-arrays pytree: static shapes for XLA, validity mask instead
of dynamic sizes (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class RadarScan:
    """One padded radar scan.

    Attributes
    ----------
    xyz:       (N, 3) point positions [m]
    doppler:   (N,)   radial Doppler velocity v_r [m/s]
    intensity: (N,)   SNR / power / RCS [vendor units]
    mask:      (N,)   1.0 for valid points, 0.0 for padding
    time:      ()     scan timestamp [s] (0 if unknown)
    """

    xyz: jnp.ndarray
    doppler: jnp.ndarray
    intensity: jnp.ndarray
    mask: jnp.ndarray
    time: jnp.ndarray

    # ---------------- derived spherical quantities ----------------
    @property
    def num_valid(self) -> jnp.ndarray:
        return jnp.sum(self.mask)

    @property
    def range(self) -> jnp.ndarray:
        """(N,) range r = |p| (ref src/iterative_closest_point.cpp:378)."""
        return jnp.linalg.norm(self.xyz, axis=-1)

    @property
    def azimuth(self) -> jnp.ndarray:
        """(N,) azimuth alpha = atan2(y, x) in RADIANS (ref :382 uses deg)."""
        return jnp.arctan2(self.xyz[..., 1], self.xyz[..., 0])

    @property
    def elevation(self) -> jnp.ndarray:
        """(N,) elevation beta = asin(z / r) in RADIANS (ref :383)."""
        r = jnp.maximum(self.range, 1e-9)
        return jnp.arcsin(jnp.clip(self.xyz[..., 2] / r, -1.0, 1.0))

    @property
    def direction(self) -> jnp.ndarray:
        """(N, 3) unit direction cosines [cos a cos b, sin a cos b, sin b] —
        the ego-velocity design matrix rows (ref :418-420)."""
        r = jnp.maximum(self.range, 1e-9)
        return self.xyz / r[..., None]

    # ---------------- constructors ----------------
    @classmethod
    def from_arrays(
        cls,
        xyz: np.ndarray,
        doppler: Optional[np.ndarray] = None,
        intensity: Optional[np.ndarray] = None,
        max_points: int = 4096,
        time: float = 0.0,
        dtype=jnp.float32,
    ) -> "RadarScan":
        """Pad/truncate variable-length host arrays into the fixed budget."""
        xyz = np.asarray(xyz, dtype=np.float32).reshape(-1, 3)
        n = min(xyz.shape[0], max_points)
        if doppler is None:
            doppler = np.zeros(xyz.shape[0], dtype=np.float32)
        if intensity is None:
            intensity = np.zeros(xyz.shape[0], dtype=np.float32)
        out_xyz = np.zeros((max_points, 3), dtype=np.float32)
        out_dop = np.zeros((max_points,), dtype=np.float32)
        out_int = np.zeros((max_points,), dtype=np.float32)
        out_msk = np.zeros((max_points,), dtype=np.float32)
        out_xyz[:n] = xyz[:n]
        out_dop[:n] = np.asarray(doppler, dtype=np.float32).reshape(-1)[:n]
        out_int[:n] = np.asarray(intensity, dtype=np.float32).reshape(-1)[:n]
        out_msk[:n] = 1.0
        return cls(
            xyz=jnp.asarray(out_xyz, dtype=dtype),
            doppler=jnp.asarray(out_dop, dtype=dtype),
            intensity=jnp.asarray(out_int, dtype=dtype),
            mask=jnp.asarray(out_msk, dtype=dtype),
            time=jnp.asarray(time, dtype=dtype),
        )

    def with_mask(self, mask: jnp.ndarray) -> "RadarScan":
        """Return a scan whose validity mask is ANDed with `mask`."""
        return self.replace(mask=self.mask * mask.astype(self.mask.dtype))

    def to_numpy_valid(self) -> np.ndarray:
        """Host-side (M, 5) [x y z intensity doppler] of valid points only."""
        m = np.asarray(self.mask) > 0.5
        return np.concatenate(
            [
                np.asarray(self.xyz)[m],
                np.asarray(self.intensity)[m][:, None],
                np.asarray(self.doppler)[m][:, None],
            ],
            axis=-1,
        )


def stack_scans(scans) -> RadarScan:
    """Stack equally-padded scans into a leading batch axis (for vmap/dp)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *scans)

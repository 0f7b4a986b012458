"""Camera projection with lens distortion (Didi vehicle path).

Equivalent of the reference's hand-calibrated Didi camera model
(src/net/processing/projection.py and the ``project_point`` helper,
boxes3d.py:442-452): pinhole projection with radial (k1, k2, k3) and
tangential (p1, p2) distortion. Vectorized jnp; used only on the Didi data
path (KITTI uses the plain calibration matmul in ops/boxes3d.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import jax.numpy as jnp
import numpy as np

# Didi capture-vehicle calibration (reference projection.py constants /
# boxes3d.py:454-477 projection matrix comments)
DIDI_CAMERA_MATRIX = np.array([
    [1384.621562, 0.000000, 625.888005],
    [0.000000, 1393.652271, 559.626310],
    [0.000000, 0.000000, 1.000000]])
DIDI_DIST_COEFFS = np.array([-0.152089, 0.270168, 0.003143, -0.005640, 0.0])

# the calibrated 3x4 lidar->image projection the reference's LIVE didi rgb
# path uses (box3d_to_rgb_projection_cv2, reference boxes3d.py:474-484; the
# distortion camera above is its provenance, kept for the correction tools)
DIDI_PROJ_MAT = np.array([
    [6.24391515e+02, -1.35999541e+03, -3.47685065e+01, -8.19238784e+02],
    [5.20528665e+02, 1.80893752e+01, -1.38839738e+03, -1.17506110e+03],
    [9.99547104e-01, 3.36246424e-03, -2.99045429e-02, -1.34871685e+00]])


@dataclass
class CameraModel:
    """Pinhole + distortion camera: ``project(points)`` -> pixel coords."""
    camera_matrix: np.ndarray = field(
        default_factory=lambda: DIDI_CAMERA_MATRIX.copy())
    extrinsic: np.ndarray = field(default_factory=lambda: np.eye(4))
    dist_coeffs: np.ndarray = field(
        default_factory=lambda: DIDI_DIST_COEFFS.copy())

    def project(self, points: jnp.ndarray) -> jnp.ndarray:
        """(..., 3) world points -> (..., 2) distorted pixel coordinates.

        Parity: reference ``project_point`` (boxes3d.py:442-452).
        """
        E = jnp.asarray(self.extrinsic, jnp.float32)
        K = jnp.asarray(self.camera_matrix, jnp.float32)
        d = jnp.asarray(self.dist_coeffs, jnp.float32)

        cam = (jnp.einsum("ij,...j->...i", E[0:3, 0:3],
                          points.astype(jnp.float32),
                          precision="highest") + E[0:3, 3])
        x1 = cam[..., 0] / cam[..., 2]
        y1 = cam[..., 1] / cam[..., 2]
        r2 = x1 * x1 + y1 * y1
        factor = 1.0 + d[0] * r2 + d[1] * r2 ** 2 + d[4] * r2 ** 3
        x2 = x1 * factor + 2 * d[2] * x1 * y1 + d[3] * (r2 + 2 * x1 * x1)
        y2 = y1 * factor + d[2] * (r2 + 2 * y1 * y1) + 2 * d[3] * x1 * y1
        u = K[0, 0] * x2 + K[0, 2]
        v = K[1, 1] * y2 + K[1, 2]
        return jnp.stack([u, v], axis=-1)

    def distortion_correct(self, pixels: jnp.ndarray,
                           iterations: int = 5) -> jnp.ndarray:
        """Invert the distortion by fixed-point iteration (the equivalent of
        the reference's ``distortion_correct``)."""
        K = jnp.asarray(self.camera_matrix, jnp.float32)
        d = jnp.asarray(self.dist_coeffs, jnp.float32)
        x = (pixels[..., 0] - K[0, 2]) / K[0, 0]
        y = (pixels[..., 1] - K[1, 2]) / K[1, 1]
        x0, y0 = x, y
        for _ in range(iterations):
            r2 = x * x + y * y
            factor = 1.0 + d[0] * r2 + d[1] * r2 ** 2 + d[4] * r2 ** 3
            dx = 2 * d[2] * x * y + d[3] * (r2 + 2 * x * x)
            dy = d[2] * (r2 + 2 * y * y) + 2 * d[3] * x * y
            x = (x0 - dx) / factor
            y = (y0 - dy) / factor
        u = K[0, 0] * x + K[0, 2]
        v = K[1, 1] * y + K[1, 2]
        return jnp.stack([u, v], axis=-1)

"""Finite-difference Jacobian validation.

The reference builds its Jacobian by graph-colored finite differences
(timestepper.F90:1584-1607, MatFDColoring); this framework assembles
an exact AD block Jacobian instead (solver/system.py). This module is
the validation bridge the build plan kept (SURVEY §7.3): directional
central differences of the residual — evaluated at frozen regions,
exactly as the reference freezes regions during FD perturbations
(doc/dev/code/index.md:37-39) — compared against the assembled BSR
matrix-vector product.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def jacobian_fd_error(
    system,
    y,
    region,
    rock,
    coeffs,
    t0,
    t1,
    num_probes: int = 4,
    h: float = 1e-6,
    seed: int = 0,
):
    """Max relative error of the AD Jacobian against central FD over
    `num_probes` random directions: max_v |J v - FD_v| / |FD_v|.

    Run in f64 (h=1e-6 on the O(1) scaled primaries gives ~1e-8 FD
    truncation); a healthy AD Jacobian scores below ~1e-5.
    """
    rng = np.random.RandomState(seed)
    r0, _, _, _, mat = system.residual_and_jacobian(
        y, region, rock, coeffs, t0, t1
    )
    mv = system.make_matvec(mat)
    worst = 0.0
    mask = np.asarray(system.update_mask)
    for _ in range(num_probes):
        v = jnp.asarray(
            rng.standard_normal(np.asarray(y).shape) * mask[:, None]
        )
        rp, _, _, _ = system.residual(
            y + h * v, region, rock, coeffs, t0, t1
        )
        rm, _, _, _ = system.residual(
            y - h * v, region, rock, coeffs, t0, t1
        )
        fd = (rp - rm) / (2.0 * h)
        jv = mv(v)
        num = float(jnp.max(jnp.abs(jv - fd)))
        den = float(jnp.max(jnp.abs(fd))) or 1.0
        worst = max(worst, num / den)
    return worst

"""Device-side mesh arrays.

The static geometry the assembly kernels need, as a pytree of jnp
arrays extracted once from the host Mesh.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from waiwera_tpu.mesh.core import Mesh

Array = jnp.ndarray


class MeshArrays(NamedTuple):
    face_cells: Array  # [F, 2] int32
    face_area: Array  # [F]
    face_distance: Array  # [F, 2]
    face_distance12: Array  # [F]
    face_gravity_normal: Array  # [F]
    face_permeability_direction: Array  # [F] int32
    cell_volume: Array  # [N]
    is_ghost: Array  # [N] bool
    num_cells: int
    num_interior_cells: int

    @property
    def num_faces(self) -> int:
        return self.face_area.shape[0]


def mesh_arrays(mesh: Mesh) -> MeshArrays:
    return MeshArrays(
        face_cells=jnp.asarray(mesh.face_cells, jnp.int32),
        face_area=jnp.asarray(mesh.face_area),
        face_distance=jnp.asarray(mesh.face_distance),
        face_distance12=jnp.asarray(mesh.face_distance12),
        face_gravity_normal=jnp.asarray(mesh.face_gravity_normal),
        face_permeability_direction=jnp.asarray(
            mesh.face_permeability_direction, jnp.int32
        ),
        cell_volume=jnp.asarray(mesh.cell_volume),
        is_ghost=jnp.asarray(mesh.is_ghost),
        num_cells=mesh.num_cells,
        num_interior_cells=mesh.num_interior_cells,
    )

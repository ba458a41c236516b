"""Unstructured finite-volume mesh layer (host-side NumPy).

Replaces the reference's DMPlex usage (mesh.F90, dm_utils.F90) with
precomputed dense mesh arithmetic: face->cell connectivity, FV geometry,
boundary ghost cells appended as extra rows, natural ordering preserved
for I/O. The device-side solver only ever sees flat arrays.
"""

from waiwera_tpu.mesh.core import Mesh, build_mesh
from waiwera_tpu.mesh.rect import rectangular_mesh, column_mesh

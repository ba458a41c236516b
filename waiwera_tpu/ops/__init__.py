"""TPU-optimised compute kernels (XLA-friendly layouts + Pallas).

- ell: scatter-free block-sparse SpMV (ELL layout)
- stencil: Pallas DIA/stencil SpMV for rectilinear meshes
"""

from waiwera_tpu.ops.dia import (  # noqa: F401
    DIAMatrix,
    DIAStructure,
    dia_structure,
    to_dia,
)
from waiwera_tpu.ops.ell import (  # noqa: F401
    ELLMatrix,
    ELLStructure,
    ell_structure,
    to_ell,
)

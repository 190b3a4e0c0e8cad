"""Single-device numerics for the Harmony engine.

Pure-JAX/XLA implementations of every hot kernel in the reference engine
(src/harmony.cpp, src/utils.cpp), written shape-static and fusion-friendly so
XLA tiles the matmuls onto the MXU. Pallas variants for the hottest paths
live in :mod:`harmony_tpu.ops.pallas_kernels` and are selected automatically
on TPU backends.
"""

from .normalize import l1_normalize_columns, l2_normalize_columns  # noqa: F401
from .assign import (  # noqa: F401
    compute_distances,
    initial_assignments,
    make_blocks,
)
from .estep import (  # noqa: F401
    block_update_round,
    make_rotate_layout,
    objective_from_stats,
    rotate_update_round,
)
from .objective import compute_objective  # noqa: F401
from .stats import compute_E, compute_O, penalty_for_cells  # noqa: F401
from .kmeans import kmeans_centers  # noqa: F401
from .ridge import moe_correct_ridge  # noqa: F401

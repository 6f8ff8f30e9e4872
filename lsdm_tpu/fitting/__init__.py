"""Object fitting & scene assembly (reference repo-root fitting stack).

The hot math (grid search over 36x11x11 poses, Adam pose refinement) runs
as single jitted/vmapped device programs; host-side geometry (DBSCAN
clustering, voxel downsampling) uses the native C++ kernels in ``native/``.
"""

from lsdm_tpu.fitting.place_obj import (
    contact_loss,
    penetration_loss,
    compute_signed_distances,
    grid_search,
    refine_pose,
)
from lsdm_tpu.fitting.config import FITTING_PARAMS, CLASSES_EPS

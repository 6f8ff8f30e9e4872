"""TPU-native point-cloud / geometry / metric ops.

These replace the reference's native-dependency ops (SURVEY.md §2.9):
pytorch3d chamfer -> :func:`chamfer_distance` (XLA / Pallas),
pointnet2 CUDA-ish utilities -> :mod:`pointcloud`,
openmesh spiral extraction -> :mod:`spiral`,
scipy Hungarian EMD -> :mod:`metrics` (host callback) + Sinkhorn on device.
"""

from lsdm_tpu.ops.pointcloud import (
    square_distance,
    index_points,
    chamfer_distance,
    farthest_point_sample,
    query_ball_point,
    knn,
    three_nn_interpolate,
)
from lsdm_tpu.ops.embeddings import timestep_embedding, positional_encoding_table
from lsdm_tpu.ops.chamfer_pallas import chamfer_distance_pallas
from lsdm_tpu.ops.icp import icp, random_restart_icp, transform_points
from lsdm_tpu.ops.geometry import (
    normalize_orientation,
    read_sdf,
    oriented_bbox,
    translate_objs_to_bbox,
    translate_bbox_obj,
    estimate_floor_height,
    load_scene_data,
)

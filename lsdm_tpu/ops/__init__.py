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

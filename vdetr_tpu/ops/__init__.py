from vdetr_tpu.ops.fps import furthest_point_sample
from vdetr_tpu.ops.gather import gather_operation, grouping_operation
from vdetr_tpu.ops.ball_query import ball_query
from vdetr_tpu.ops.interpolate import three_nn, three_interpolate
from vdetr_tpu.ops.voxelize import voxelize, VoxelGrid
from vdetr_tpu.ops.hungarian import hungarian

from vdetr_tpu.geometry.boxes import (
    flip_axis_to_camera,
    flip_axis_to_depth,
    convert_corners_camera2lidar,
    roty_batch,
    rotz_batch,
    get_3d_box_batch,
    box_parametrization_to_corners,
    shift_scale_points,
    scale_points,
    rotate_aligned_boxes_np,
)
from vdetr_tpu.geometry.iou import (
    box3d_vol_corners,
    enclosing_box3d_vol,
    generalized_box3d_iou,
    rotated_intersection_areas,
    diff_diou_rotated_3d,
    box3d_iou_np,
)
from vdetr_tpu.geometry.points_in_boxes import points_in_boxes_all
from vdetr_tpu.geometry.nms import (
    nms_2d_faster_np,
    nms_3d_faster_np,
    nms_3d_faster_samecls_np,
    nms_3d_samecls_mask,
)

from .camera import (
    Camera,
    quat_xyzw_to_rotmat,
    quat_wxyz_to_rotmat,
    rotmat_to_quat_xyzw,
    pose_to_extr,
    extr_to_pose,
    pix2world,
    world2pix,
    default_intrinsics,
)
from .scene import (
    GaussianScene,
    scene_capacity,
    activate,
    activate_inv,
    make_empty_scene,
    scene_from_arrays,
)

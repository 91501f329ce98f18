"""Pure-function 3D geometry and volume-rendering math.

Everything here is a jit-able, shape-polymorphic function over leading batch
dimensions, with explicit RNG keys and no hidden state. This layer replaces the
reference's `utils/lib_3d` (ray_helper.py, pose_parameters.py, bounding_box.py,
transformations_3d.py) and the math half of `model/object_composer.py`.
"""

from playableenvironments_tpu.core import bbox, compositing, rays, transforms3d
from playableenvironments_tpu.core.bbox import (
    aabb_center,
    aabb_contains,
    aabb_corners,
    aabb_size,
    ray_aabb_bounds,
)
from playableenvironments_tpu.core.compositing import (
    alphas_from_raw,
    compose_objects,
    compositing_weights,
    expected_positions,
    integrate,
    position_distances,
)
from playableenvironments_tpu.core.rays import (
    camera_rays,
    sample_pdf,
    stratified_ray_positions,
    transform_points,
    transform_rays,
    weighted_ray_positions,
)
from playableenvironments_tpu.core.transforms3d import (
    euler_translation_to_matrix,
    invert_rigid,
    matrix_to_euler_translation,
    rotation_x,
    rotation_y,
    rotation_z,
)

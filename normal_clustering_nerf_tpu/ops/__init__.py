from .morton import morton3d, morton3d_invert  # noqa: F401
from .packbits import packbits, unpack_bit  # noqa: F401
from .trunc_exp import trunc_exp  # noqa: F401
from .ray_aabb import ray_aabb_intersect, ray_sphere_intersect  # noqa: F401
from .composite import (  # noqa: F401
    composite_rays,
    composite_rays_compact,
    composite_reference_grads,
)
from .ray_march import (  # noqa: F401
    MarchResult,
    calc_dt,
    march_rays_train,
    occupancy_lookup,
    t_step_grid,
)
from .distortion import distortion_loss  # noqa: F401
from .kmeans import spherical_kmeans, normals_clustering  # noqa: F401

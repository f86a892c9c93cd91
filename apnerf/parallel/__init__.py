from .mesh import (make_mesh, replicated, ray_sharded, put_replicated,
                   put_ray_sharded, RAY_AXIS)
from .distributed import initialize, local_batch_slice

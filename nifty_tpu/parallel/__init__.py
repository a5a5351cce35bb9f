from .fft import sharded_fft2, sharded_hartley, sharded_hartley2
from .mesh import replicated_sharding, sample_mesh, sample_sharding
from .multihost import (
    global_mesh,
    host_local_slice,
    initialize,
    process_count,
    process_index,
)

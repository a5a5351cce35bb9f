from .fft import sharded_fft2, sharded_hartley, sharded_hartley2
from .mesh import replicated_sharding, sample_mesh, sample_sharding

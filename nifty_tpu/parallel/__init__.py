from .mesh import sample_mesh, sample_sharding, replicated_sharding

from .mesh import make_mesh, data_sharding, replicated_sharding, shard_batch
from .sharding_rules import make_param_shardings, param_partition_spec, shard_params
from .distributed import maybe_initialize_distributed

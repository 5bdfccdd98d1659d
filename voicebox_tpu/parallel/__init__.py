from .mesh import make_mesh, data_sharding, replicated_sharding, shard_batch
from .sharding_rules import make_param_shardings, param_partition_spec, shard_params
from .distributed import maybe_initialize_distributed
from .sequence_parallel import make_sp_pair, sp_forward, make_sp_loss_fn
from .pipeline import make_pp_forward

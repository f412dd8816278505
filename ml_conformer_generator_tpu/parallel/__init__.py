from .edge_shard import dynamics_forward_sharded, egnn_forward_sharded
from .mesh import data_sharding, make_mesh, make_two_level_mesh, replicated
from .sampler import (ShardedEDMSampler, make_sharded_generate,
                      make_sharded_inpaint, make_sharded_merge)
from .screening import ScreeningDriver

__all__ = [
    "ScreeningDriver", "ShardedEDMSampler", "data_sharding",
    "dynamics_forward_sharded", "egnn_forward_sharded", "make_mesh",
    "make_sharded_generate", "make_sharded_inpaint", "make_sharded_merge",
    "make_two_level_mesh", "replicated",
]

from .edge_shard import dynamics_forward_sharded, egnn_forward_sharded
from .mesh import data_sharding, make_mesh, replicated

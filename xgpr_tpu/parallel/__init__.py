from .mesh import data_mesh, batch_sharding, replicated, DATA_AXIS
from .sharded import ShardedEngine
from .streaming import StreamingShardedEngine

from .mesh import (data_sharded, make_mesh, replicate, replicated,
                   shard_batch)

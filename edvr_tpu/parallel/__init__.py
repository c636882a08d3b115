from edvr_tpu.parallel.dist_util import (get_dist_info, init_dist,
                                         master_only)
from edvr_tpu.parallel.mesh import (get_data_mesh, shard_batch,
                                    replicate_tree)

__all__ = [
    'get_dist_info', 'init_dist', 'master_only', 'get_data_mesh',
    'shard_batch', 'replicate_tree'
]

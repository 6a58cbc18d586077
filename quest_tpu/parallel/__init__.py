from quest_tpu.parallel.mesh import (DP_AXIS, TP_AXIS, cache_specs,
                                     make_mesh, param_specs, shard_params)
from quest_tpu.parallel.multihost import (global_batch, host_local_logits,
                                          initialize_cluster,
                                          make_global_mesh)
from quest_tpu.parallel.tp import (init_sharded_cache, local_config,
                                   make_sharded_fns)

__all__ = ["DP_AXIS", "TP_AXIS", "cache_specs", "make_mesh", "param_specs",
           "shard_params", "init_sharded_cache", "local_config",
           "make_sharded_fns", "initialize_cluster", "make_global_mesh",
           "global_batch", "host_local_logits"]

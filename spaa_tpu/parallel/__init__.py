from spaa_tpu.parallel.mesh import (batch_sharding, make_mesh, replicate,
                                    replicated, shard_attack_inputs,
                                    shard_batch)

__all__ = ["batch_sharding", "make_mesh", "replicate", "replicated",
           "shard_attack_inputs", "shard_batch"]

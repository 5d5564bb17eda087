from pips_tpu.parallel.mesh import (batch_pspecs, default_mesh_shape,
                                    distributed_init, make_hybrid_mesh,
                                    make_mesh, make_sharded_forward,
                                    make_sharded_train_step, replicate,
                                    shard_batch)

__all__ = ["batch_pspecs", "default_mesh_shape", "distributed_init",
           "make_hybrid_mesh", "make_mesh", "make_sharded_forward",
           "make_sharded_train_step", "replicate", "shard_batch"]

from vpt_tpu.parallel.mesh import make_mesh, replicated, batch_sharded, seq_sharded, shard_batch

__all__ = ["make_mesh", "replicated", "batch_sharded", "seq_sharded", "shard_batch"]

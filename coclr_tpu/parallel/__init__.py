from coclr_tpu.parallel.mesh import make_mesh, shard_map_fn
from coclr_tpu.parallel.train_step import make_pretrain_step

__all__ = ["make_mesh", "shard_map_fn", "make_pretrain_step"]

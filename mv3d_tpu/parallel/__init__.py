"""Multi-chip scaling: meshes, shardings, sharded train/infer steps."""

from .mesh import (make_mesh, replicate, shard_batch,  # noqa: F401
                   make_sharded_train_step, make_sharded_infer_step)

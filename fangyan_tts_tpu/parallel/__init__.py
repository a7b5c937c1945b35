"""SPMD parallelism over `jax.sharding.Mesh`: data/FSDP/tensor axes.

Replaces the reference's torch DDP + DeepSpeed ZeRO-2 stack
(cosyvoice/utils/train_utils.py:94-141) with XLA-compiled collectives over
ICI: grads are psum'd by pjit, optimizer state is sharded (ZeRO analogue)
by sharding-constraining it to the FSDP axis.
"""

from .mesh import make_mesh, local_mesh
from .sharding import param_pspec, shard_pytree, batch_pspec

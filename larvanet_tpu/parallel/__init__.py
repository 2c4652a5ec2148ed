from larvanet_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from larvanet_tpu.parallel.halo import halo_exchange, spatial_sharded_forward

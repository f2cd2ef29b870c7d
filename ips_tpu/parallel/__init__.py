from ips_tpu.parallel.mesh import make_mesh, shard_batch, replicate  # noqa: F401
from ips_tpu.parallel.ips_sharded import ips_select_cp, ShardedIPSTrainer  # noqa: F401

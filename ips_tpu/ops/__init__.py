from ips_tpu.ops.selection import SelectionResult, ips_select, select_top_m  # noqa: F401
from ips_tpu.ops.shuffle import make_permutation  # noqa: F401

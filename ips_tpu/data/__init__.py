from ips_tpu.data.loader import DataLoader, Dataset  # noqa: F401
from ips_tpu.data.patchify import patchify  # noqa: F401

from ips_tpu.data.camelyon.dataset import CamelyonFeatures  # noqa: F401

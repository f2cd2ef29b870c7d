from ips_tpu.utils.profiling import (EfficiencyTracker, device_peak_bytes,  # noqa: F401
                                     host_sync)

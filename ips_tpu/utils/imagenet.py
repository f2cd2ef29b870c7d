"""torchvision's ImageNet normalization constants — ONE source of truth.

Used by the host-side float path (ips_tpu/data/traffic.py, mirroring the
reference's transforms.Normalize, reference data/traffic/
traffic_dataset.py:275-290) and by the on-device path
(`input_norm='imagenet'`, ips_tpu/models/ips_net.py). The two paths must
use identical values for the uint8/float equivalence tests to hold.

Kept as host numpy: they become in-trace constants under jit (creating
device arrays at import time would touch the backend before config).
"""

import numpy as np

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)

"""ips_tpu — a TPU-native (JAX/XLA/Pallas) framework for Iterative Patch Selection.

Built from scratch with the capabilities of the reference implementation
(benbergner/ips, ICLR 2023 "Iterative Patch Selection for High-Resolution
Image Recognition"): memory-bounded classification of megapixel inputs by
streaming N patches through a no-gradient encoder in fixed-size chunks,
keeping a running top-M buffer ranked by cross-attention saliency, then
re-encoding only the M survivors with gradients and aggregating them with a
learnable-query cross-attention transformer into per-task heads.

Everything here is designed TPU-first: fixed shapes, `lax.scan` selection,
`lax.top_k`, sharding over `jax.sharding.Mesh`, optional Pallas kernels for
the fused score path, bf16 compute with fp32 parameters.
"""

from ips_tpu.config import Config, TaskConfig, load_config  # noqa: F401

__version__ = "0.1.0"

"""Shared numeric constants.

NEG_INF is the masked-logit fill value used consistently by the
selection scan (ips_tpu/ops/selection.py), the cross-attention scorer
(ips_tpu/models/transformer.py) and the Pallas score kernel
(ips_tpu/ops/score_kernel.py): finite (softmax-safe in bf16/fp32) yet
far below any real logit, mirroring the reference's masking-by-shuffle
tie semantics (reference architecture/transformer.py:20-41 has no mask;
masking is this framework's padding-aware extension).
"""

NEG_INF = -1e9

from ips_tpu.models.transformer import CrossAttnTransformer, pos_enc_1d  # noqa: F401
from ips_tpu.models.encoders import ConvPatchEncoder, FeatureProjector  # noqa: F401
from ips_tpu.models.ips_net import IPSModel, init_ips_model  # noqa: F401

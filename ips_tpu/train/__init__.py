from ips_tpu.train.schedule import warmup_cosine_lr  # noqa: F401
from ips_tpu.train.metrics import MetricsLogger  # noqa: F401
from ips_tpu.train.steps import IPSTrainer, TrainState  # noqa: F401
from ips_tpu.train.loop import train_one_epoch, evaluate  # noqa: F401

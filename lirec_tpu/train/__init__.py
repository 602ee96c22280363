from lirec_tpu.train.optim import make_optimizer  # noqa: F401
from lirec_tpu.train.loop import train  # noqa: F401

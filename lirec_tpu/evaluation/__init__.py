from lirec_tpu.evaluation.metrics import (  # noqa: F401
    MetricAccumulator,
    RelationshipsAcc,
    TracksSearch,
)
from lirec_tpu.evaluation.runner import evaluate  # noqa: F401

from coclr_tpu.models.encoder import ProjectionEncoder
from coclr_tpu.models.classifier import LinearClassifier

__all__ = ["ProjectionEncoder", "LinearClassifier"]

from qadc_tpu.eval.recall import recall_at_r
from qadc_tpu.eval.metrics import QueryMetrics, PhaseTimer

__all__ = ["recall_at_r", "QueryMetrics", "PhaseTimer"]

from openpvsg_tpu.eval.vpq import vpq_eval, pq_summary
from openpvsg_tpu.eval import rel_metrics

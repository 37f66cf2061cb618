from dsrg_tpu.ops.crf.api import CRF, DenseCRF, crf_refine_probs, crf_log_refine  # noqa: F401
from dsrg_tpu.ops.crf.exact import mean_field_exact  # noqa: F401

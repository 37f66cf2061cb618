from dsrg_tpu.ops.softmax import floored_softmax  # noqa: F401
from dsrg_tpu.ops.interp import caffe_interp_shrink, zoom_matrix, zoom_bilinear  # noqa: F401

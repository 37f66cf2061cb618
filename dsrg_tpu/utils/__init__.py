from dsrg_tpu.utils.confusion import ConfusionMatrix, confusion_matrix_np  # noqa: F401
from dsrg_tpu.utils.palette import VOC_PALETTE, write_palette_png, write_png, read_mask_png  # noqa: F401

from dsrg_tpu.models.vgg16_largefov import DeepLabLargeFOV  # noqa: F401
from dsrg_tpu.models.resnet101_deeplab import ResNet101DeepLab  # noqa: F401

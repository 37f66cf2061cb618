from dsrg_tpu.models.vgg16_largefov import DeepLabLargeFOV  # noqa: F401

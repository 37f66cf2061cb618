from dsrg_tpu.data.cues import CueDB  # noqa: F401
from dsrg_tpu.data.voc import (  # noqa: F401
    Stage1Dataset,
    Stage2Dataset,
    load_image_bgr,
    preprocess_image,
    read_id_list,
    read_pair_list,
)
from dsrg_tpu.data.loader import PrefetchLoader  # noqa: F401

from istvt_tpu.compat.torch_import import (
    xception_from_torch,
    istvt_from_torch,
    dsttr_from_torch,
)

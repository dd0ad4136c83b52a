from istvt_tpu.nn import layers
from istvt_tpu.nn import attention

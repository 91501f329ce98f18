"""TPU-oriented ops: fixed-shape crops and (later) Pallas render kernels."""

from playableenvironments_tpu.ops.roi_crop import crop_and_resize

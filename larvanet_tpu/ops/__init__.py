from larvanet_tpu.ops.resize import upsample, bicubic_weights
from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle

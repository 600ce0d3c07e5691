from .dcn import deform_conv2d_pallas

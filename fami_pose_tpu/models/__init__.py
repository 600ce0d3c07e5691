from .layers import ConvBnAct, BasicBlock, Bottleneck, ChainOfBasicBlocks, Interpolate
from .hrnet import HRNet, HighResolutionModule
from .build import build_model, get_model_hyperparameter
from .fami_pose import FAMIPose, GlobalOffsetHead, DeformConv, init_weights_reference
from .deform_blocks import AdaptBlock, AdaptBlockV2, DeformBlock, modulated_deform_conv

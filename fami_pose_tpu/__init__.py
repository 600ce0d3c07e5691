"""FAMI-Pose TPU: a TPU-native (JAX/XLA/Pallas/pjit) multi-frame human pose
estimation framework with the capabilities of Pose-Group/FAMI-Pose (CVPR 2022).

Top-down video pose estimation: a key frame plus N supporting frames are
crop-warped per person box, pushed through a shared HRNet-W48 backbone, the
supporting-frame features are hierarchically aligned onto the key frame
(global affine + stacked modulated deformable convolutions), and the fused
features predict per-joint Gaussian heatmaps. Training adds a 6-term mutual
information loss; evaluation decodes heatmaps sub-pixel and scores with the
official PoseTrack AP protocol.

Everything on the compute path is jit-compiled for TPU: batched affine
crop-warp and heatmap target generation, NHWC bf16 convolutions on the MXU,
a Pallas modulated-deformable-conv kernel, fused decode, and a data-parallel
``jax.sharding.Mesh`` train step.
"""

__version__ = "0.1.0"

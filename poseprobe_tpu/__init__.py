"""PoseProbe-TPU: TPU-native few-shot unposed view synthesis framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
zhirui-gao/PoseProbe ("Generic Objects as Pose Probes for Few-shot View
Synthesis", IEEE TCSVT 2025): dual-branch (object voxel-SDF + scene NeRF)
volume rendering with joint SE(3) camera refinement, seeded by feature
matching + PnP against a cube-initialized pose-probe SDF.
"""
__version__ = "0.1.0"

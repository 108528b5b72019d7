"""vdetr_tpu: a TPU-native (JAX/XLA/Pallas) 3D object-detection framework.

A from-scratch rebuild of the capabilities of V-DETR ("DETR with Vertex
Relative Position Encoding for 3D Object Detection", ICLR 2024) designed
TPU-first:

- all point/voxel ops are static-shape, padded, and `jit`-compilable
  (reference: CUDA kernels under third_party/pointnet2/_ext_src);
- the sparse 3D ResNet backbone is a sorted-voxel-key gather/matmul
  sparse convolution (reference: MinkowskiEngine);
- the vertex-RPE cross-attention computes its 8-corner relative-position
  bias on device (reference: models/vdetr_transformer.py:656-758);
- Hungarian matching, GIoU, and NMS run device-side under jit
  (reference: criterion.py, utils/box_util.py, utils/nms.py);
- data parallelism is a `jax.sharding.Mesh` + `shard_map` with psum/pmean
  collectives (reference: torch DDP + NCCL, utils/dist.py).
"""

__version__ = "0.1.0"

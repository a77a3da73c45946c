"""TPU-native face re-identification framework.

A ground-up JAX/XLA/Pallas rebuild of the SCRFD + ArcFace face
re-identification stack (reference: Kumar2421/scrfd_arcface_facerecognition):

- ``ops``      — cv2/skimage-parity numerics (letterbox, anchor decode, NMS,
                 umeyama alignment, affine warp, cosine matching) as pure JAX
                 + Pallas TPU kernels.
- ``models``   — Flax re-implementations of the SCRFD detector family and the
                 ArcFace embedders (iResNet-50 / MobileFaceNet), NHWC layout,
                 ONNX weight import.
- ``pipeline`` — the fused, single-jit detect→align→embed→match program over
                 batched HBM-resident frames.
- ``gallery``  — TPU-resident embedding gallery (the Qdrant replacement):
                 k-NN as one matmul + top-k, G×G duplicate detection,
                 incremental CRC snapshots, product-quantized capacity tier.
- ``parallel`` — device-mesh sharding: frame data-parallelism and gallery
                 sharding with ICI collectives.
- ``train``    — ArcFace margin-softmax training (class-sharded partial-FC
                 head, DP×TP) and SCRFD detector training (ATSS assignment,
                 QFL/DIoU/landmark losses) with data + eval tooling.
- ``apps``     — preserved user surfaces: real-time CLI, visit clustering
                 engine, verification flow, web API.
- ``runtime``  — host-side runtime: C++ frame prefetch ring, C++ ffmpeg
                 video decoder, gallery snapshot store, config system.
"""

__version__ = "0.3.0"

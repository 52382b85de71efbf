"""TPU compute kernels (Pallas) and jittable scoring ops.

The hot ops of the query path — dense tiled-matmul scan, sparse BM25 scan,
filter masking, top-k, hybrid fusion — live here as Pallas TPU kernels with
pure-XLA fallbacks. Everything is shape-static and jit-safe so the whole
query path compiles into one device program.
"""

from voitta_rag_tpu.ops.dense_scan import dense_scan_scores  # noqa: F401
from voitta_rag_tpu.ops.sparse_scan import sparse_scan_scores  # noqa: F401
from voitta_rag_tpu.ops.filters import FilterSpec, NO_FOLDER, PASS  # noqa: F401
from voitta_rag_tpu.ops.topk import masked_topk  # noqa: F401
from voitta_rag_tpu.ops.fusion import hybrid_fuse, rrf_fuse  # noqa: F401

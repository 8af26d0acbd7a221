"""niqki_tpu — a TPU-native genome-sketch similarity search engine.

Built from scratch for JAX/XLA/Pallas: sketching is vectorized hashing plus
segmented min-reduction on device, the inverted index is a dense (G, F)
fingerprint matrix in HBM, and query/all-vs-all intersection counting runs as
blocked equality-count reductions, sharded over device meshes with jax
collectives. Output-compatible with NIQKI (bit-for-bit on its golden data).
"""

from .params import SketchParams
from .index import SketchIndex

__version__ = "0.1.0"
__all__ = ["SketchParams", "SketchIndex"]

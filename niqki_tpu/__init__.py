"""niqki_tpu — a TPU-native genome-sketch similarity search engine.

Built from scratch for JAX/XLA/Pallas: sketching is vectorized hashing plus
segmented min-reduction on device, the inverted index is a dense (G, F)
fingerprint matrix in HBM, and query/all-vs-all intersection counting runs as
blocked equality-count reductions, sharded over device meshes with jax
collectives. Output-compatible with NIQKI (bit-for-bit on its golden data).
"""

import os as _os


def _enable_persistent_compile_cache() -> None:
    """Point JAX at a persistent on-disk compilation cache.

    TPU compiles routed through a remote transport take minutes; the engine's
    kernel set is small and static, so caching them across processes turns
    every startup after the first into a cache hit. Configured through env
    vars (read by jax.config at its own import) so importing niqki_tpu never
    imports jax — fully host-routed jobs stay jax-free end to end. Opt out
    with NIQKI_TPU_NO_COMPILE_CACHE=1 or by pre-setting
    JAX_COMPILATION_CACHE_DIR.
    """
    if _os.environ.get("NIQKI_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import sys as _sys
        path = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache", "niqki_tpu",
                          "jax_cache"))
        _os.makedirs(path, exist_ok=True)
        _os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
        _os.environ.setdefault(
            "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
        if "jax" in _sys.modules:
            # Already imported (e.g. by this box's sitecustomize): the env
            # vars were read at that import, so apply via config instead.
            # Never import jax ourselves — a fully host-routed job must
            # stay jax-free.
            import jax
            jax.config.update("jax_compilation_cache_dir", path)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_persistent_compile_cache()

from .params import SketchParams  # noqa: E402
from .index import SketchIndex  # noqa: E402

__version__ = "0.1.0"
__all__ = ["SketchParams", "SketchIndex"]

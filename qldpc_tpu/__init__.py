"""qldpc_tpu — TPU-native quantum LDPC decoding framework.

A from-scratch JAX/XLA/Pallas framework covering the capabilities of the
reference qLDPC research codebase (BB codes, BP/min-sum decoding, OSD
post-processing, Monte-Carlo logical-error-rate studies), redesigned
TPU-first: batched edge-list message passing under ``lax.scan``, bit-packed
on-device GF(2) elimination, and mesh-sharded Monte-Carlo counting.
"""

import os as _os

from qldpc_tpu import codes

__version__ = "0.1.0"


def enable_compilation_cache(path: str | None = None) -> None:
    """Persist compiled executables across processes (compiles on remote-TPU
    links are expensive; the cache makes reruns near-instant)."""
    import jax

    path = path or _os.environ.get(
        "QLDPC_TPU_CACHE", _os.path.expanduser("~/.cache/qldpc_tpu_xla")
    )
    _os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

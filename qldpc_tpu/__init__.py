"""qldpc_tpu — TPU-native quantum LDPC decoding framework.

A from-scratch JAX/XLA/Pallas framework covering the capabilities of the
reference qLDPC research codebase (BB codes, BP/min-sum decoding, OSD
post-processing, Monte-Carlo logical-error-rate studies), redesigned
TPU-first: batched edge-list message passing under ``lax.scan``, bit-packed
on-device GF(2) elimination, and mesh-sharded Monte-Carlo counting.
"""

from qldpc_tpu import codes

__version__ = "0.1.0"

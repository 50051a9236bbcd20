from .bp import BPConfig, BPDecoder, BPResult

__all__ = ["BPConfig", "BPDecoder", "BPResult"]

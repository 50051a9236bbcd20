from .mesh import BATCH_AXIS, PartitionSpec, init_distributed, make_mesh

__all__ = ["BATCH_AXIS", "PartitionSpec", "init_distributed", "make_mesh"]

from infomax3d_tpu.parallel.context import cross_replica_axis, using_cross_replica_axis
from infomax3d_tpu.parallel.mesh import make_mesh
from infomax3d_tpu.parallel.collectives import CrossDeviceLoss

__all__ = ["cross_replica_axis", "using_cross_replica_axis", "make_mesh",
           "CrossDeviceLoss"]

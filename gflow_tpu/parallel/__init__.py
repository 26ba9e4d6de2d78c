from .mesh import make_mesh, tile_sharded_composite_constraint
from .multichip import sharded_train_step, dryrun_step

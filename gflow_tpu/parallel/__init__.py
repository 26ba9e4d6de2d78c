from .mesh import make_mesh, sharded_batch_apply
from .multichip import sharded_train_step, dryrun_step

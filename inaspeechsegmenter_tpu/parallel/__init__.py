from .mesh import make_mesh, make_2d_mesh, shard_batch, replicate
from .engine import ParallelEngine
from .jobs import JobServer, JobClient, client_work_loop
from .multihost import init_multihost, global_mesh

__all__ = ["make_mesh", "make_2d_mesh", "shard_batch", "replicate",
           "ParallelEngine", "JobServer", "JobClient", "client_work_loop",
           "init_multihost", "global_mesh"]

from .mesh import (
    make_mesh,
    shard_chains,
    lanczos_sharded,
    total_dos_psum,
    rowsharded_spmv_step,
)

__all__ = [
    "make_mesh", "shard_chains", "lanczos_sharded", "total_dos_psum",
    "rowsharded_spmv_step",
]

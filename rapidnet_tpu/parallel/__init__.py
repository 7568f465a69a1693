from rapidnet_tpu.parallel.sharding import (make_mesh, make_sharded_apg,
                                            make_sharded_quasi_newton,
                                            shard_factor_arrays,
                                            shard_step_arrays)

__all__ = ["make_mesh", "make_sharded_apg", "make_sharded_quasi_newton",
           "shard_factor_arrays", "shard_step_arrays"]

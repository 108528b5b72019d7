from vdetr_tpu.parallel.mesh import make_mesh, data_sharding, replicated

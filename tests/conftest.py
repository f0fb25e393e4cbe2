"""Test configuration: CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh (the TPU
analog of the reference's `mpirun -np 2` single-node distributed tests,
/root/reference/tests/test_lmp_with_ase.py:224-232). Real-hardware runs go
through bench.py / __graft_entry__.py instead.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin (sitecustomize) force-sets jax_platforms="axon,cpu";
# override it so unit tests run on the virtual-device CPU backend.
jax.config.update("jax_platforms", "cpu")

# Double precision available for golden/parity tests; fp32 paths construct
# their arrays explicitly. fp32 matmuls at highest precision — the TPU
# equivalent of the reference's TF32-off policy
# (/root/reference/models/lammps_ani.py:10-12).
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")

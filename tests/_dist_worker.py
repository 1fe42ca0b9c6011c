"""Worker for the 2-process jax.distributed test (run by test_pipeline.py).

Each process bootstraps via parallel.distributed.init (the branch that calls
jax.distributed.initialize — the RPC client/server round trip analog,
ggml-rpc.cpp:569-601), builds a global mesh spanning BOTH processes' CPU
devices, and runs one psum over a process-spanning sharded array.
"""
import os
import sys

# must win before sitecustomize-registered plugins pick a platform
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)   # 2 local x 2 procs = 4 global

import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402
from jax.experimental.shard_map import shard_map  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from ggml_imax_tpu.parallel import distributed  # noqa: E402


def main() -> None:
    pid = int(sys.argv[1])
    port = sys.argv[2]
    ci = distributed.init(coordinator_address=f"localhost:{port}",
                          num_processes=2, process_id=pid)
    assert ci.process_count == 2, ci
    assert ci.local_devices == 2 and ci.global_devices == 4, ci
    assert ci.process_index == pid, ci

    mesh = distributed.global_mesh({"dp": -1})
    assert mesh.shape["dp"] == 4

    # global (4, 8) array, one row per device; each process materializes
    # only its addressable shards (the multi-host loading pattern)
    full = np.arange(32, dtype=np.float32).reshape(4, 8)
    sharding = NamedSharding(mesh, P("dp"))
    x = jax.make_array_from_callback(full.shape, sharding,
                                     lambda idx: full[idx])

    f = jax.jit(shard_map(lambda a: jax.lax.psum(a, "dp"), mesh=mesh,
                          in_specs=P("dp"), out_specs=P()))
    y = f(x)
    got = np.asarray(y.addressable_data(0))
    np.testing.assert_allclose(got, full.sum(axis=0, keepdims=True))
    print(f"PSUM_OK {pid} {got[0, :3].tolist()}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()

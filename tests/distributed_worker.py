"""Worker for the 2-process jax.distributed smoke test (test_distributed.py).

Runs one dp-sharded STTN GAN train step over a global 2-device CPU mesh
(one device per process, gloo collectives) and writes its metrics to a JSON
file. Mirrors what `train_sttn.py --distributed` does on real multi-host
(train/train_sttn.py:39-42), shrunk to the tiny test geometry.

Invoked as:  python distributed_worker.py <process_id> <coordinator> <out.json>
"""

import json
import os
import sys

# one real CPU device per process: drop the 8-virtual-device forcing the
# test harness sets for the parent
os.environ.pop("XLA_FLAGS", None)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def main():
    pid = int(sys.argv[1])
    coordinator = sys.argv[2]
    out_path = sys.argv[3]

    jax.distributed.initialize(coordinator, num_processes=2, process_id=pid)
    assert jax.device_count() == 2 and jax.local_device_count() == 1

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from tests.test_train import fake_batch, tiny_cfg, tiny_models
    from vsr_tpu.train.sttn_trainer import init_train_state, make_train_step

    gen, dis = tiny_models()
    cfg = tiny_cfg()
    # identical full batch on every process; each feeds only its local shard
    frames, masks = fake_batch(cfg, batch=2)

    mesh = Mesh(np.array(jax.devices()), ("data",))
    sharding = NamedSharding(mesh, P("data"))
    gframes = jax.make_array_from_process_local_data(
        sharding, frames[pid : pid + 1], frames.shape)
    gmasks = jax.make_array_from_process_local_data(
        sharding, masks[pid : pid + 1], masks.shape)

    state = init_train_state(gen, dis, cfg)
    step = make_train_step(gen, dis, cfg, mesh=mesh)
    with mesh:
        new_state, metrics = step(state, gframes, gmasks)

    result = {k: float(v) for k, v in metrics.items()}
    result["step"] = int(new_state.step)
    result["process_id"] = pid
    with open(out_path, "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()

"""Two-process jax.distributed smoke test (VERDICT r3 item 6).

The reference trains multi-node over NCCL+MPI env sniffing
(backend/tools/train/train_sttn.py:33-40, utils_sttn.py:216-258); the vsr_tpu
equivalent is `train_sttn.py --distributed` -> jax.distributed.initialize().
Until now that flag was parsed but never EXECUTED as two real processes.

This test spawns 2 local processes (CPU backend, 1 device each, gloo
collectives), runs one dp-sharded GAN train step over the global 2-device
mesh, and asserts both processes agree with each other AND with a
single-process unsharded run on the same batch — i.e. the cross-process
collective path computes the same math.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # ~2 jax cold starts on the 1-core host

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_train_step(tmp_path):
    port = _free_port()
    outs = [str(tmp_path / f"proc{i}.json") for i in range(2)]
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(i), f"localhost:{port}", outs[i]],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        logs.append(out)
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"proc {i} failed:\n{logs[i][-2000:]}"

    results = []
    for path in outs:
        with open(path) as f:
            results.append(json.load(f))

    # both processes computed the same (globally reduced) metrics
    for key in ("gen_loss", "dis_loss", "hole_loss", "valid_loss"):
        assert results[0][key] == pytest.approx(results[1][key], rel=1e-5), key
        assert np.isfinite(results[0][key])
    assert results[0]["step"] == results[1]["step"] == 1

    # ...and they match a single-process unsharded run on the same batch
    import jax.numpy as jnp

    from tests.test_train import fake_batch, tiny_cfg, tiny_models
    from vsr_tpu.train.sttn_trainer import init_train_state, make_train_step

    gen, dis = tiny_models()
    cfg = tiny_cfg()
    frames, masks = fake_batch(cfg, batch=2)
    state = init_train_state(gen, dis, cfg)
    step = make_train_step(gen, dis, cfg)
    _, metrics = step(state, jnp.asarray(frames), jnp.asarray(masks))
    for key in ("gen_loss", "dis_loss", "hole_loss"):
        assert results[0][key] == pytest.approx(float(metrics[key]),
                                                rel=1e-4), key

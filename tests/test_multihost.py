"""Multi-host (2-process) mesh test: DCN data axis x ICI point axis.

Spawns two real processes joined through ``jax.distributed`` (Gloo CPU
collectives), builds the hybrid mesh (``parallel/mesh.py:make_hybrid_mesh``),
and runs one full sharded train step where each host feeds only its own
process-local batch slice. Proves the multi-host composition the train loop
uses (``--multihost``) end-to-end without TPU pod hardware.
"""

import socket
import subprocess
import sys
import textwrap

CHILD = textwrap.dedent("""
    import os, sys
    pid, port = int(sys.argv[1]), sys.argv[2]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp
    from pips_tpu.models import Pips
    from pips_tpu.parallel import (distributed_init, make_hybrid_mesh,
                                   make_sharded_train_step, replicate,
                                   shard_batch)
    from pips_tpu.train.optim import make_optimizer
    from pips_tpu.train.step import TrainState

    distributed_init(coordinator=f"localhost:{port}", num_processes=2,
                     process_id=pid)
    assert jax.device_count() == 4 and jax.local_device_count() == 2

    mesh = make_hybrid_mesh((1, 2))  # per-host ici (data=1, point=2); dcn=2
    assert mesh.devices.shape == (2, 2)

    TINY = dict(S=4, stride=8, latent_dim=16, corr_levels=3, corr_radius=2,
                mixer_dim=32, mixer_depth=2)
    model = Pips(**TINY)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 4, 2)),
                        jnp.zeros((1, 4, 48, 64, 3)), iters=1)
    tx = make_optimizer(1e-3, 10)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    state = jax.device_put(state, replicate(mesh))

    step = make_sharded_train_step(model, tx, mesh, iters=1, horz_flip=False,
                                   vert_flip=False, donate_state=False)

    # per-host local slice: B_local=1 of a global B=2 batch (deterministic
    # per pid so both processes agree on the global contents)
    rng = np.random.RandomState(100 + pid)
    B_local, S, N, H, W = 1, 4, 8, 48, 64
    batch_local = {
        "rgbs": (rng.rand(B_local, S, H, W, 3) * 255).astype(np.float32),
        "trajs": (rng.rand(B_local, S, N, 2) * [W - 8, H - 8] + 4).astype(np.float32),
        "visibles": (rng.rand(B_local, S, N) > 0.3).astype(np.float32),
        "valids": np.ones((B_local, S, N), np.float32),
    }
    batch = shard_batch(mesh, batch_local)
    assert batch["rgbs"].shape == (2, S, H, W, 3)  # global batch assembled

    state, metrics = step(state, batch)
    loss = float(jax.device_get(metrics["total_loss"]))
    psum = float(sum(jnp.sum(jnp.abs(l)) for l in jax.tree.leaves(
        jax.device_get(state.params))))
    print(f"RESULT pid={pid} loss={loss:.6f} psum={psum:.6f}", flush=True)
""")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_hybrid_mesh_train_step():
    port = _free_port()
    procs = [subprocess.Popen([sys.executable, "-c", CHILD, str(i), str(port)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              cwd="/root/repo")
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode())
    results = {}
    for i, out in enumerate(outs):
        lines = [l for l in out.splitlines() if l.startswith("RESULT")]
        assert lines, f"process {i} produced no result:\n{out[-3000:]}"
        parts = dict(kv.split("=") for kv in lines[0].split()[1:])
        results[int(parts["pid"])] = (float(parts["loss"]), float(parts["psum"]))
    assert set(results) == {0, 1}
    # replicated state: both hosts observe the same loss and updated params
    assert results[0][0] == results[1][0]
    assert results[0][1] == results[1][1]
    assert results[0][0] > 0 and all(
        abs(v) < 1e9 for pair in results.values() for v in pair)

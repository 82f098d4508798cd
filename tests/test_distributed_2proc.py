"""2-process CPU test of the multi-host stack: init_distributed +
per-process sharded feeding + DP train step (Gloo collectives).

Round-1 review flagged parallel/distributed.py as never having run
multi-process; this launches two real processes, each staging its own
half of the global batch through NpyPatchLoader(device=batch_sharding)
(which routes through jax.make_array_from_process_local_data), and
asserts the distributed loss equals the single-process loss.
"""

import socket
import subprocess
import sys
import textwrap

import numpy as np

import jax
import jax.numpy as jnp

from phasegen_tpu.data import synth_dataset
from phasegen_tpu.models import UNetConfig
from phasegen_tpu.train import build_train_step, create_train_state
from phasegen_tpu.train.state import make_optimizer

CFG = UNetConfig(input_nc=16, output_nc=32, length=128)
N_FFT, HOP, T_SAMP = 32, 8, 127 * 8

_WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, {repo!r})
    pid = int(sys.argv[1])
    os.environ["JAX_COORDINATOR"] = "localhost:" + sys.argv[2]
    os.environ["JAX_NUM_PROCESSES"] = "2"
    os.environ["JAX_PROCESS_ID"] = str(pid)
    import jax
    jax.config.update("jax_platforms", "cpu")
    from phasegen_tpu.parallel.distributed import init_distributed, is_primary
    assert init_distributed() is True
    assert jax.device_count() == 2, jax.device_count()
    assert jax.local_device_count() == 1
    assert is_primary() == (pid == 0)

    import numpy as np
    from phasegen_tpu.data.loader import NpyPatchLoader
    from phasegen_tpu.models import UNetConfig
    from phasegen_tpu.parallel import (batch_sharding, build_dp_train_step,
                                       make_mesh, shard_train_state)
    from phasegen_tpu.train import create_train_state
    from phasegen_tpu.train.state import make_optimizer

    CFG = UNetConfig(input_nc=16, output_nc=32, length=128)
    mesh = make_mesh(n_data=2, n_model=1)
    opt = make_optimizer(1e-3)
    state = shard_train_state(
        create_train_state(jax.random.PRNGKey(0), CFG, opt), mesh)

    # this process's half of the global batch, fed through the loader
    loader = NpyPatchLoader([sys.argv[3] + f"/shard_{{pid}}.npy"],
                            batch_size=2, shuffle=False, prefetch=0,
                            device=batch_sharding(mesh, 4))
    batch = next(iter(loader))
    assert batch.shape[0] == 4  # global batch spans both processes

    step = build_dp_train_step(CFG, opt, mesh, state)
    state, m = step(state, batch)
    print(f"LOSS {{float(m['loss']):.8f}}", flush=True)
""").format(repo="/root/repo")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_dp_matches_single_process(tmp_path):
    d = synth_dataset(4, n_fft=N_FFT, hop=HOP, t_samples=T_SAMP, seed=9)
    np.save(tmp_path / "shard_0.npy", d[:2])
    np.save(tmp_path / "shard_1.npy", d[2:])
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)

    port = str(_free_port())
    import os

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen([sys.executable, str(script), str(pid), port,
                          str(tmp_path)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True, env=env)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    losses = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("LOSS")]
        assert line, out
        losses.append(float(line[0].split()[1]))
    assert losses[0] == losses[1]  # replicated metric identical

    # single-process reference on the same global batch
    opt = make_optimizer(1e-3)
    state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    step = build_train_step(CFG, opt)
    _, m = step(state, jnp.asarray(d))
    assert abs(losses[0] - float(m["loss"])) < 1e-5

"""bf16 Adam first-moment option and host/device data-path selection."""

import numpy as np

import jax
import jax.numpy as jnp

from phasegen_tpu.data import synth_dataset
from phasegen_tpu.models import UNetConfig
from phasegen_tpu.train import build_train_step, create_train_state
from phasegen_tpu.train.state import make_optimizer

CFG = UNetConfig(input_nc=16, output_nc=32, length=128)
N_FFT, HOP, T_SAMP = 32, 8, 127 * 8


def test_bf16_mu_trains_close_to_f32():
    batch = jnp.asarray(synth_dataset(4, n_fft=N_FFT, hop=HOP,
                                      t_samples=T_SAMP, seed=1))

    def run(mu_dtype):
        opt = make_optimizer(1e-3, mu_dtype=mu_dtype)
        state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
        step = build_train_step(CFG, opt)
        for _ in range(6):
            state, m = step(state, batch)
        return float(m["loss"]), state

    l32, s32 = run(None)
    l16, s16 = run(jnp.bfloat16)
    # first moment stored in bf16
    mus16 = [x for x in jax.tree.leaves(s16.opt_state)
             if hasattr(x, "dtype") and x.dtype == jnp.bfloat16]
    assert mus16, "no bf16 moments found"
    # training trajectory stays close
    assert abs(l16 - l32) / max(abs(l32), 1e-6) < 0.05


def test_device_data_flag_off_uses_host_loader(tmp_path, capsys):
    from phasegen_tpu.cli import train as train_cli

    d = synth_dataset(8, n_fft=N_FFT, hop=HOP, t_samples=T_SAMP)
    p = tmp_path / "s.npy"
    np.save(p, d)
    common = [
        "--log_dir", str(tmp_path / "run"),
        "--train_paths", str(p), "--val_paths", str(p),
        "--batch_size", "4", "--val_batch_size", "2",
        "--n_fft", str(N_FFT), "--hop", str(HOP),
        "--val_every", "100", "--ckpt_every", "0", "--gl_iters", "1",
        "--max_steps", "2", "--compute_dtype", "float32",
        "--no_media", "--no_data_parallel", "--prefetch", "0",
    ]
    train_cli.main(common + ["--device_data_gb", "0"])
    out1 = capsys.readouterr().out
    assert "device-resident" not in out1
    train_cli.main(common + ["--device_data_gb", "4", "--no_resume"])
    out2 = capsys.readouterr().out
    assert "device-resident" in out2

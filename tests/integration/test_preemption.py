"""Preemption safety: SIGTERM mid-training checkpoints and resumes cleanly."""

import pytest

pytestmark = pytest.mark.slow

import json
import os
import signal
import subprocess
import sys
import time

import pytest

SCRIPT = """
import os
import jax
jax.config.update("jax_platforms", "cpu")
_cc = os.environ.get("MOLVAX_TEST_COMPILE_CACHE")
if _cc:  # share the suite's persistent compile cache (conftest.py)
    jax.config.update("jax_compilation_cache_dir", _cc)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import sys
from molvax.config import Config, DataConfig, ModelConfig, TrainConfig
from molvax.data import synthetic_dataset
from molvax.train import train

ckpt, metrics = sys.argv[1], sys.argv[2]
cfg = Config(
    model=ModelConfig(max_len=32, charset_size=37, latent_dim=8,
                      enc_hidden=12, gru_hidden=12, gru_layers=1),
    train=TrainConfig(batch_size=8, log_every=5, checkpoint_every=100000,
                      checkpoint_dir=ckpt),
    data=DataConfig(max_len=32),
)
ds = synthetic_dataset(64, max_len=32, seed=0)
state, _ = train(cfg, dataset=ds, max_steps=100000, metrics_path=metrics, verbose=False)
print("CLEAN-EXIT", int(jax.device_get(state.step)))
"""


def test_sigterm_checkpoints_and_resumes(tmp_path):
    ckpt = str(tmp_path / "ck")
    metrics = str(tmp_path / "m.jsonl")
    env = dict(os.environ)
    # Subprocess output goes to files, not PIPEs: the shared compile cache
    # makes XLA's cpu_aot_loader print ~4KB stderr warnings per cache-entry
    # load, which fills an unread 64KB pipe buffer and deadlocks the trainer
    # mid-write while this test polls for progress.
    out_path, err_path = tmp_path / "out.txt", tmp_path / "err.txt"
    with open(out_path, "w") as out_f, open(err_path, "w") as err_f:
        proc = subprocess.Popen(
            [sys.executable, "-c", SCRIPT, ckpt, metrics],
            env=env,
            stdout=out_f,
            stderr=err_f,
            text=True,
        )
        # wait until training demonstrably progresses
        deadline = time.time() + 180
        while time.time() < deadline:
            if os.path.exists(metrics) and len(open(metrics).readlines()) >= 2:
                break
            if proc.poll() is not None:
                out, err = out_path.read_text(), err_path.read_text()
                raise AssertionError(f"trainer died early: {out}\n{err}")
            time.sleep(0.5)
        else:
            proc.kill()
            raise AssertionError("trainer never progressed")

        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=120)
    out, err = out_path.read_text(), err_path.read_text()
    assert proc.returncode == 0, (out, err)
    assert "CLEAN-EXIT" in out
    assert "checkpointing at step" in err

    # the checkpoint holds the step where we stopped
    from molvax.io import checkpoint as ckpt_io

    manager = ckpt_io.make_manager(ckpt)
    saved_step = manager.latest_step()
    assert saved_step is not None and saved_step > 0
    exit_step = int(out.split("CLEAN-EXIT")[1].strip())
    assert saved_step == exit_step

    # and the next run RESUMES from it (the headline claim): training picks
    # up at saved_step and advances, not from a fresh init
    import jax

    from molvax.config import Config, DataConfig, ModelConfig, TrainConfig
    from molvax.data import synthetic_dataset
    from molvax.train import train

    cfg = Config(
        model=ModelConfig(max_len=32, charset_size=37, latent_dim=8,
                          enc_hidden=12, gru_hidden=12, gru_layers=1),
        train=TrainConfig(batch_size=8, log_every=1, checkpoint_every=100000,
                          checkpoint_dir=ckpt),
        data=DataConfig(max_len=32),
    )
    ds = synthetic_dataset(64, max_len=32, seed=0)
    state, history = train(cfg, dataset=ds, max_steps=saved_step + 3, verbose=False)
    assert int(jax.device_get(state.step)) == saved_step + 3
    assert history[0]["step"] > saved_step  # no steps before the restore point
